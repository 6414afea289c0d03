"""Checkpoint converter tests: reference-layout torch state dicts -> our
params, with numeric output comparison against the torch mirrors."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.core.config import (  # noqa: E402
    ConformerConfig,
    FrontendConfig,
    MultiTargetConfig,
    VocoderConfig,
)
from lip2speech_tpu.convert import torch_to_jax as conv  # noqa: E402
from lip2speech_tpu.models.multi_target import MultiTargetModel  # noqa: E402
from lip2speech_tpu.models.vocoder import MelCodeGenerator  # noqa: E402

from ref_mirror import RefMelCodeGenerator, RefMultiTarget  # noqa: E402


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_convert_multi_target_conformer_only():
    torch.manual_seed(0)
    tm = RefMultiTarget(d=64, ff=128, h=4, layers=2, k=7, vocab=204).eval()
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(0)
    b, t = 2, 5
    video = rng.standard_normal((b, t, 40, 40), dtype=np.float32)
    mask = np.ones((b, t), bool)
    mask[1, 3:] = False
    spk = rng.standard_normal((b, 256), dtype=np.float32)

    with torch.no_grad():
        ref_units, ref_mel, _ = tm(torch.from_numpy(video)[:, None],
                                   torch.from_numpy(mask), torch.from_numpy(spk))

    cfg = MultiTargetConfig(
        frontend=FrontendConfig(kind="resnet3d"),
        conformer=ConformerConfig(dim=64, ffn_dim=128, heads=4, layers=2,
                                  conv_kernel=7, input_dim=512))
    variables = conv.convert_multi_target(_sd(tm), cfg)
    model = MultiTargetModel(cfg)
    out = model.apply(variables, jnp.asarray(video)[..., None], jnp.asarray(mask),
                      jnp.asarray(spk), train=False)

    units = np.asarray(out["unit_logits"])
    mel = np.asarray(out["mel"])
    # compare valid positions only
    valid2 = np.repeat(mask, 2, axis=1)
    valid4 = np.repeat(mask, 4, axis=1)
    np.testing.assert_allclose(units[valid2], ref_units.numpy()[valid2], atol=5e-4)
    np.testing.assert_allclose(mel[valid4], ref_mel.numpy()[valid4], atol=5e-4)


VOC_CFG = VocoderConfig(
    model_in_dim=4 + 2 * 8, num_embeddings=16, embedding_dim=8, embedder_dim=12,
    upsample_initial_channel=16, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))


def test_convert_vocoder_generator():
    torch.manual_seed(1)
    tm = RefMelCodeGenerator(VOC_CFG).eval()
    rng = np.random.default_rng(1)
    tc = 6
    code = rng.integers(0, 16, (2, tc)).astype(np.int32)
    mel = rng.standard_normal((2, 4, 2 * tc), dtype=np.float32)
    spk = rng.standard_normal((2, 12), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(code).long(), torch.from_numpy(mel),
                 torch.from_numpy(spk)).numpy()[:, 0]

    params = conv.convert_vocoder_generator(_sd(tm), VOC_CFG)
    model = MelCodeGenerator(VOC_CFG)
    out = model.apply({"params": params}, jnp.asarray(code),
                      jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(spk),
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_convert_discriminators_layout():
    """Build torch MPD/MSD with reference key names and check the converted
    trees load into our discriminators."""
    import torch.nn as tnn
    from torch.nn.utils import spectral_norm, weight_norm

    class DP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convs = tnn.ModuleList([
                weight_norm(tnn.Conv2d(1, 32, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(32, 128, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(128, 512, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(512, 1024, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(1024, 1024, (5, 1), 1, padding=(2, 0)))])
            self.conv_post = weight_norm(tnn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))

    class DS(tnn.Module):
        def __init__(self, use_sn):
            super().__init__()
            f = spectral_norm if use_sn else weight_norm
            self.convs = tnn.ModuleList([
                f(tnn.Conv1d(1, 128, 15, 1, padding=7)),
                f(tnn.Conv1d(128, 128, 41, 2, groups=4, padding=20)),
                f(tnn.Conv1d(128, 256, 41, 2, groups=16, padding=20)),
                f(tnn.Conv1d(256, 512, 41, 4, groups=16, padding=20)),
                f(tnn.Conv1d(512, 1024, 41, 4, groups=16, padding=20)),
                f(tnn.Conv1d(1024, 1024, 41, 1, groups=16, padding=20)),
                f(tnn.Conv1d(1024, 1024, 5, 1, padding=2))])
            self.conv_post = f(tnn.Conv1d(1024, 1, 3, 1, padding=1))

    class DO(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mpd = tnn.Module()
            self.mpd.discriminators = tnn.ModuleList([DP() for _ in range(5)])
            self.msd = tnn.Module()
            self.msd.discriminators = tnn.ModuleList(
                [DS(True), DS(False), DS(False)])

    torch.manual_seed(2)
    do = DO()
    sd = {k: v.detach().numpy() for k, v in do.state_dict().items()}
    mpd_p, msd_p, spectral = conv.convert_vocoder_discriminators(sd)

    from lip2speech_tpu.models.vocoder import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)

    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((1, 400), dtype=np.float32))
    rs, gs, _, _ = MultiPeriodDiscriminator().apply({"params": mpd_p}, y, y, train=False)
    assert len(rs) == 5
    rs2, _, _, _ = MultiScaleDiscriminator().apply(
        {"params": msd_p, "spectral": spectral}, y, y, train=False)
    assert len(rs2) == 3
    for a, b in zip(rs, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
