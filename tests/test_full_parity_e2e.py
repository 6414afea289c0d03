"""Full-chain parity: reference-layout torch stage-1 + vocoder, converted and
run through our jitted end-to-end pipeline, must reproduce the torch chain's
waveform. This is SURVEY.md §7's "minimum end-to-end slice" executed against
torch mirrors in place of the (unavailable) published checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.core.config import (  # noqa: E402
    ConformerConfig,
    FrontendConfig,
    MultiTargetConfig,
    PipelineConfig,
    VocoderConfig,
)
from lip2speech_tpu.convert import torch_to_jax as conv  # noqa: E402
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline  # noqa: E402

from ref_mirror import RefMelCodeGenerator, RefMultiTarget  # noqa: E402

D, FF, H, LAYERS, K = 64, 128, 4, 2, 7
EMB = 8
VOC = VocoderConfig(
    model_in_dim=80 + 2 * EMB, num_embeddings=200, embedding_dim=EMB,
    embedder_dim=256, upsample_initial_channel=32,
    upsample_rates=(5, 4, 2, 2, 2), upsample_kernel_sizes=(11, 8, 4, 4, 4),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),))


def test_full_chain_parity():
    torch.manual_seed(0)
    s1 = RefMultiTarget(d=D, ff=FF, h=H, layers=LAYERS, k=K, vocab=204).eval()
    for m in s1.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)
    voc = RefMelCodeGenerator(VOC).eval()

    rng = np.random.default_rng(0)
    b, frames = 1, 6
    video = rng.standard_normal((b, frames, 88, 88), dtype=np.float32)
    mask = np.ones((b, frames), bool)
    spk = rng.standard_normal((b, 256), dtype=np.float32)

    # ---- torch chain: stage1 -> argmax units -> vocoder ----
    with torch.no_grad():
        unit_logits, mel, _ = s1(torch.from_numpy(video)[:, None],
                                 torch.from_numpy(mask), torch.from_numpy(spk))
        units = unit_logits[..., 4:].argmax(-1)          # banned specials
        wav_ref = voc(units, torch.from_numpy(np.ascontiguousarray(
            mel.numpy().transpose(0, 2, 1))), torch.from_numpy(spk))
        wav_ref = wav_ref.numpy()[:, 0]

    # ---- converted chain through the jitted pipeline ----
    cfg = PipelineConfig(
        model=MultiTargetConfig(
            frontend=FrontendConfig(kind="resnet3d"),
            conformer=ConformerConfig(dim=D, ffn_dim=FF, heads=H, layers=LAYERS,
                                      conv_kernel=K, input_dim=512)),
        vocoder=VOC)
    s1_vars = conv.convert_multi_target(
        {k: v.detach().numpy() for k, v in s1.state_dict().items()}, cfg.model)
    voc_params = conv.convert_vocoder_generator(
        {k: v.detach().numpy() for k, v in voc.state_dict().items()}, VOC)

    pipe = Lip2SpeechPipeline(cfg, s1_vars, voc_params)
    results = pipe.synthesise_batch(video[..., None], mask, spk)

    # units identical, waveform within fp tolerance
    np.testing.assert_array_equal(results[0].units, units.numpy()[0])
    assert results[0].wav.shape == wav_ref[0].shape
    np.testing.assert_allclose(results[0].wav, wav_ref[0], atol=2e-4)
    # mel parity too
    np.testing.assert_allclose(results[0].mel, mel.numpy()[0], atol=5e-4)
