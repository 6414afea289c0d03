"""Parity vs the REAL reference vocoder models.

Oracles (imported from /root/reference):
  speech-resynthesis/models.py::Generator / MultiPeriodDiscriminator /
  MultiScaleDiscriminator / feature_loss / discriminator_loss / generator_loss
  multi_input_vocoder/models_multi_input.py::MelCodeGenerator

Random torch weights -> converter -> flax, outputs compared. Complements
tests/test_vocoder_parity.py (torch mirror) with the reference's own code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_oracle
from ref_oracle import AttrDict

from lip2speech_tpu.core.config import VocoderConfig
from lip2speech_tpu.convert.torch_to_jax import (
    convert_vocoder_discriminators,
    convert_vocoder_generator,
)
from lip2speech_tpu.models import vocoder as fv

SMALL_H = dict(
    resblock="1",
    upsample_rates=[5, 4, 2, 2, 2],
    upsample_kernel_sizes=[11, 8, 4, 4, 4],
    upsample_initial_channel=32,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    model_in_dim=336,
    num_embeddings=20,
    embedding_dim=128,
    embedder_dim=256,
    multispkr="_",
    text_supervision=False,
)


def _small_cfg() -> VocoderConfig:
    return VocoderConfig(
        model_in_dim=SMALL_H["model_in_dim"],
        num_embeddings=SMALL_H["num_embeddings"],
        embedding_dim=SMALL_H["embedding_dim"],
        embedder_dim=SMALL_H["embedder_dim"],
        upsample_initial_channel=SMALL_H["upsample_initial_channel"],
        upsample_rates=tuple(SMALL_H["upsample_rates"]),
        upsample_kernel_sizes=tuple(SMALL_H["upsample_kernel_sizes"]),
        resblock_kernel_sizes=tuple(SMALL_H["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in SMALL_H["resblock_dilation_sizes"]),
    )


def test_melcode_generator_vs_reference():
    """MelCodeGenerator forward (models_multi_input.py:60-97): unit codes +
    mel + speaker d-vector -> waveform, via the 320x HiFi-GAN stack."""
    torch = ref_oracle.require_ref()
    MelCodeGenerator = ref_oracle.melcode_generator_cls()
    torch.manual_seed(0)
    ref_gen = MelCodeGenerator(AttrDict(SMALL_H)).eval()

    rng = np.random.default_rng(0)
    B, Tc = 2, 4
    code = rng.integers(0, SMALL_H["num_embeddings"], (B, Tc))
    mel = rng.standard_normal((B, 80, 2 * Tc), dtype=np.float32)
    spkr = rng.standard_normal((B, 256), dtype=np.float32)

    with torch.no_grad():
        ref_wav = ref_gen(
            code=torch.from_numpy(code).long(),
            mel=torch.from_numpy(mel),
            spkr=torch.from_numpy(spkr),
        ).numpy()[:, 0, :]

    params = convert_vocoder_generator(ref_oracle.state_dict_numpy(ref_gen), _small_cfg())
    out = fv.MelCodeGenerator(_small_cfg()).apply(
        {"params": params},
        jnp.asarray(code, jnp.int32), jnp.asarray(mel.transpose(0, 2, 1)),
        jnp.asarray(spkr), deterministic=True,
    )
    out = np.asarray(out)
    assert out.shape == ref_wav.shape == (B, 320 * Tc)
    np.testing.assert_allclose(out, ref_wav, atol=2e-5)


def test_discriminators_and_losses_vs_reference():
    """MPD + MSD scores/fmaps and the three GAN losses
    (speech-resynthesis/models.py:232-387)."""
    torch = ref_oracle.require_ref()
    m = ref_oracle.sr_models()
    torch.manual_seed(1)
    mpd = m.MultiPeriodDiscriminator()
    msd = m.MultiScaleDiscriminator()

    rng = np.random.default_rng(1)
    B, T = 2, 400
    y = rng.standard_normal((B, 1, T), dtype=np.float32) * 0.1
    y_hat = rng.standard_normal((B, 1, T), dtype=np.float32) * 0.1
    ty, tyh = torch.from_numpy(y), torch.from_numpy(y_hat)

    # converge the spectral-norm power iteration (torch updates u/v once per
    # training-mode forward) so eval-mode sigma is a fixed point that our
    # (W, u)-only computation reproduces
    with torch.no_grad():
        for _ in range(50):
            msd(ty, tyh)
    mpd.eval(), msd.eval()

    with torch.no_grad():
        r_mpd, g_mpd, fr_mpd, fg_mpd = mpd(ty, tyh)
        r_msd, g_msd, fr_msd, fg_msd = msd(ty, tyh)
        ref_d = (m.discriminator_loss(r_mpd, g_mpd)[0]
                 + m.discriminator_loss(r_msd, g_msd)[0]).item()
        ref_adv = (m.generator_loss(g_mpd)[0] + m.generator_loss(g_msd)[0]).item()
        ref_fm = (m.feature_loss(fr_mpd, fg_mpd)
                  + m.feature_loss(fr_msd, fg_msd)).item()

    sd = {}
    sd.update({f"mpd.{k}": v for k, v in ref_oracle.state_dict_numpy(mpd).items()})
    sd.update({f"msd.{k}": v for k, v in ref_oracle.state_dict_numpy(msd).items()})
    mpd_p, msd_p, msd_u = convert_vocoder_discriminators(sd)

    jy, jyh = jnp.asarray(y[:, 0]), jnp.asarray(y_hat[:, 0])
    frs, fgs, fmr, fmg = fv.MultiPeriodDiscriminator().apply(
        {"params": mpd_p}, jy, jyh, train=False)
    srs, sgs, smr, smg = fv.MultiScaleDiscriminator().apply(
        {"params": msd_p, "spectral": msd_u}, jy, jyh, train=False)

    for ref_s, our_s in zip(r_mpd + r_msd, frs + srs):
        np.testing.assert_allclose(np.asarray(our_s), ref_s.numpy(), atol=2e-4)

    d = float(fv.discriminator_loss(frs, fgs) + fv.discriminator_loss(srs, sgs))
    adv = float(fv.generator_adv_loss(fgs) + fv.generator_adv_loss(sgs))
    fm = float(fv.feature_loss(fmr, fmg) + fv.feature_loss(smr, smg))
    np.testing.assert_allclose(d, ref_d, rtol=1e-4)
    np.testing.assert_allclose(adv, ref_adv, rtol=1e-4)
    np.testing.assert_allclose(fm, ref_fm, rtol=1e-3)
