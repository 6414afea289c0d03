"""Fused resblock-trio Pallas kernel (ops/pallas_fused_tail.py).

Parity oracle is trio_xla — the same math as the generator's ResBlock1 loop
(models/vocoder.py), which is itself pinned against the REAL torch generator
in tests/test_ref_oracle_vocoder.py. Kernel runs in interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lip2speech_tpu.ops.pallas_fused_tail import fused_resblock_trio, trio_xla

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _weights(rng, C, dtype=jnp.float32, ks=KS, dils=DILS):
    ws = []
    for k, ds in zip(ks, dils):
        rb = []
        for _ in ds:
            rb.append(
                ((jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, dtype),
                  jnp.asarray(rng.standard_normal(C) * 0.1, dtype)),
                 (jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, dtype),
                  jnp.asarray(rng.standard_normal(C) * 0.1, dtype))))
        ws.append(rb)
    return ws


@pytest.mark.parametrize("C,fold", [(16, 8), (32, 4), (64, 2), (128, 1)])
def test_parity_all_stage_shapes(C, fold):
    """Every generator stage layout, with multi-tile grids and a ragged
    final tile (M=96, block 48 -> 2 tiles; M=100 -> padded last tile)."""
    rng = np.random.default_rng(C)
    ws = _weights(rng, C)
    M = 96 if fold > 1 else 100
    xf = jnp.asarray(rng.standard_normal((2, M, fold * C)) * 0.5, jnp.float32)
    ref = trio_xla(xf, ws, fold, KS, DILS)
    got = fused_resblock_trio(xf, ws, fold, KS, DILS, interpret=True,
                              block_rows=48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_parity_bf16():
    rng = np.random.default_rng(7)
    ws = _weights(rng, 16, jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal((1, 64, 128)) * 0.5, jnp.bfloat16)
    ref = trio_xla(xf, ws, 8, KS, DILS)
    got = fused_resblock_trio(xf, ws, 8, KS, DILS, interpret=True,
                              block_rows=64)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.05,
                               atol=0.05)


def test_gradients_flow_through_xla_path():
    """custom_vjp backward == gradients of the XLA reference."""
    rng = np.random.default_rng(1)
    ks, dils = (3,), ((1, 3),)
    ws = _weights(rng, 16, ks=ks, dils=dils)
    xf = jnp.asarray(rng.standard_normal((1, 48, 128)) * 0.5, jnp.float32)

    def loss_fused(x, w):
        return jnp.sum(jnp.square(fused_resblock_trio(
            x, w, 8, ks, dils, interpret=True, block_rows=48)))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(trio_xla(x, w, 8, ks, dils)))

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(xf, ws)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(xf, ws)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4,
                               atol=1e-5)
    for g, r in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(rw)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)


def test_parity_fuzz_geometries():
    """Random (kernel, dilation, fold, M, block) combos — the halo/guard/
    placement math must hold for any VocoderConfig geometry, not just the
    HiFi-GAN default (3/7/11 x 1/3/5)."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        n_res = int(rng.integers(1, 3))
        ks, dils = [], []
        for _ in range(n_res):
            k = int(rng.choice([1, 3, 5, 9]))
            ks.append(k)
            dils.append(tuple(int(d) for d in
                              rng.choice([1, 2, 3, 4, 7],
                                         size=rng.integers(1, 3))))
        C, fold = [(16, 8), (32, 4), (64, 2)][trial % 3]
        M = int(rng.integers(3, 9)) * 8
        blk = int(rng.choice([16, 40, 1024]))
        ws = _weights(rng, C, ks=ks, dils=dils)
        xf = jnp.asarray(rng.standard_normal((1, M, fold * C)) * 0.5,
                         jnp.float32)
        ref = trio_xla(xf, ws, fold, ks, dils)
        got = fused_resblock_trio(xf, ws, fold, ks, dils, interpret=True,
                                  block_rows=blk)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6,
            err_msg=f"trial={trial} ks={ks} dils={dils} fold={fold} "
                    f"M={M} blk={blk}")


@pytest.mark.slow
def test_pipeline_fused_integration():
    """Full serving path (stage-1 -> units -> vocoder) with the fused tail
    forced on vs off: byte-identical pipeline wiring, near-identical wavs."""
    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    cfg = preset("multi_target")
    rng = np.random.default_rng(5)
    video = rng.standard_normal((1, 4, 88, 88, 1)).astype(np.float32)
    mask = np.ones((1, 4), bool)
    spk = rng.standard_normal((1, 256)).astype(np.float32)

    p0 = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=4,
                                              fused_tail=False)
    p1 = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=4,
                                              fused_tail=True)
    w0 = p0.synthesise_batch(video, mask, spk)[0].wav
    w1 = p1.synthesise_batch(video, mask, spk)[0].wav
    np.testing.assert_allclose(w1, w0, rtol=2e-4, atol=2e-5)


def test_serve_time_fallback_on_kernel_failure(monkeypatch):
    """An optimization must never kill serving (VERDICT r3 next #2): if the
    fused-tail kernel fails to compile (the axon relay's Mosaic
    remote-compile helper can 500), synthesise_batch rebuilds the plain XLA
    vocoder — same checkpoint tree — and still returns audio."""
    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.ops import pallas_fused_tail
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic remote-compile failure")

    monkeypatch.setattr(pallas_fused_tail, "fused_resblock_trio", boom)
    pipe = Lip2SpeechPipeline.initialize_random(preset("tiny"), seed=0,
                                                frames=4, fused_tail=True)
    video = np.zeros((1, 4, 88, 88, 1), np.float32)
    res = pipe.synthesise_batch(video, np.ones((1, 4), bool),
                                np.zeros((1, 256), np.float32))
    assert pipe.vocoder.cfg.fused_tail_kernel is False   # fell back
    assert np.isfinite(res[0].wav).all()
    # non-fused pipelines re-raise instead of looping the fallback
    p0 = Lip2SpeechPipeline.initialize_random(preset("tiny"), seed=0,
                                              frames=4, fused_tail=False)
    p0.vocoder = None  # force an unrelated failure
    with pytest.raises(Exception):
        p0.synthesise_batch(video, np.ones((1, 4), bool),
                            np.zeros((1, 256), np.float32))


def test_generator_flag_is_transparent():
    """fused_tail_kernel=True: identical param tree, identical waveform."""
    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.models.vocoder import MelCodeGenerator

    cfg = preset("multi_target").vocoder
    rng = np.random.default_rng(3)
    Tc = 6
    code = jnp.asarray(rng.integers(0, 200, (1, Tc)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((1, 2 * Tc, 80)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)

    gen0 = MelCodeGenerator(cfg)
    v0 = gen0.init(jax.random.PRNGKey(0), code, mel, spk)
    gen1 = MelCodeGenerator(dataclasses.replace(cfg, fused_tail_kernel=True))
    v1 = gen1.init(jax.random.PRNGKey(0), code, mel, spk)

    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        assert jnp.array_equal(a, b)

    y0 = gen0.apply(v0, code, mel, spk)
    y1 = gen1.apply(v0, code, mel, spk)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-5,
                               atol=2e-6)
