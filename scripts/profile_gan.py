"""Stage-2 GAN-step composition profile (B=8 x 8960-sample segments).

Splits the vocoder GAN training step into G fwd / G grad / D fwd / D grad
sub-programs plus the full fused step, to attribute where the step time
goes (reference loop: multi_input_vocoder/train.py:127-245). This is the
A/B harness for the batched-period MPD layout + conv1d_timestack first
convs (NOTES.md "Late-r3 session") — before those changes the chip showed
G fwd 4.7 / G grad 9.4 / D fwd 13.2 / D grad 40.5 ms. Relay floor is
measured and subtracted per axon rules.

    python scripts/profile_gan.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from _bench_util import sync_time  # noqa: F401 (adds repo root to sys.path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.models.vocoder import (MelCodeGenerator,  # noqa: F401
                                               MultiPeriodDiscriminator,
                                               MultiScaleDiscriminator)
    from lip2speech_tpu.train import stage2

    cfg = preset("multi_target")
    seg = cfg.vocoder.segment_size
    b = args.batch
    rng = np.random.default_rng(2)
    batch = {
        "code": jnp.asarray(rng.integers(0, 200, (b, seg // 320)), jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((b, seg // 160, 80)),
                           jnp.float32),
        "spk_emb": jnp.asarray(rng.standard_normal((b, 256)), jnp.float32),
        "audio": jnp.asarray(0.1 * rng.standard_normal((b, seg)), jnp.float32),
    }
    models, txs, state = stage2.create_gan_state(cfg, jax.random.PRNGKey(0),
                                                 batch)
    step = stage2.make_gan_step(models, txs, cfg)
    gen, mpd, msd = models

    def time_step(step, state, iters):
        """GAN steps donate state — thread the returned state through."""
        state, logs = step(state, batch, jax.random.PRNGKey(1))
        np.asarray(logs["loss_gen"])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            state, logs = step(state, batch, jax.random.PRNGKey(1))
            np.asarray(logs["loss_gen"])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    def scalar(y):
        return jnp.sum(y.astype(jnp.float32))

    # every sub-program takes its tensors as ARGUMENTS — capturing device
    # arrays as jit constants forces a lowering-time value fetch over the
    # relay (observed FAILED_PRECONDITION) and bloats the compiled program
    @jax.jit
    def floor_fn(audio):
        return scalar(audio[:2, :64])

    g_params = state.gen_params

    @jax.jit
    def g_fwd(p, code, mel, spk):
        wav = gen.apply({"params": p}, code, mel, spk, deterministic=True)
        return scalar(wav)

    @jax.jit
    def g_grad(p, code, mel, spk):
        def loss(p):
            wav = gen.apply({"params": p}, code, mel, spk,
                            deterministic=True)
            return jnp.sum(wav ** 2)
        gr = jax.grad(loss)(p)
        return sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(gr))

    wav_fake = jnp.asarray(0.1 * rng.standard_normal((b, seg)), jnp.float32)
    mpd_p, msd_p = state.mpd_params, state.msd_params

    @jax.jit
    def d_fwd(mp, sp, spectral, real, fake):
        rs, gs, _, _ = mpd.apply({"params": mp}, real, fake)
        r2, g2, _, _ = msd.apply({"params": sp, "spectral": spectral},
                                 real, fake, mutable=["spectral"])[0]
        return sum(scalar(x) for x in rs + gs + r2 + g2)

    @jax.jit
    def d_grad(mp, sp, spectral, real, fake):
        def loss(mp, sp):
            rs, gs, _, _ = mpd.apply({"params": mp}, real, fake)
            out = msd.apply({"params": sp, "spectral": spectral},
                            real, fake, mutable=["spectral"])
            r2, g2, _, _ = out[0]
            l = 0.0
            for d in rs + g2 + gs + r2:
                l = l + jnp.mean(jnp.square(d))
            return l
        gr = jax.grad(loss, argnums=(0, 1))(mp, sp)
        return sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(gr))

    # --- per-discriminator attribution (is it MPD or MSD?) ---
    @jax.jit
    def mpd_fwd(mp, real, fake):
        rs, gs, _, _ = mpd.apply({"params": mp}, real, fake)
        return sum(scalar(x) for x in rs + gs)

    @jax.jit
    def mpd_grad(mp, real, fake):
        def loss(mp):
            rs, gs, _, _ = mpd.apply({"params": mp}, real, fake)
            return sum(jnp.mean(jnp.square(d)) for d in rs + gs)
        gr = jax.grad(loss)(mp)
        return sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(gr))

    @jax.jit
    def msd_fwd(sp, spectral, real, fake):
        rs, gs, _, _ = msd.apply({"params": sp, "spectral": spectral},
                                 real, fake, mutable=["spectral"])[0]
        return sum(scalar(x) for x in rs + gs)

    @jax.jit
    def msd_grad(sp, spectral, real, fake):
        def loss(sp):
            out = msd.apply({"params": sp, "spectral": spectral},
                            real, fake, mutable=["spectral"])
            rs, gs, _, _ = out[0]
            return sum(jnp.mean(jnp.square(d)) for d in rs + gs)
        gr = jax.grad(loss)(sp)
        return sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(gr))

    g_args = (batch["code"], batch["mel"], batch["spk_emb"])
    d_args = (state.msd_spectral, batch["audio"], wav_fake)
    floor = sync_time(floor_fn, (batch["audio"],), args.iters)
    out = {"floor_ms": round(floor, 2)}
    out["g_fwd_ms"] = round(
        sync_time(g_fwd, (g_params,) + g_args, args.iters) - floor, 1)
    out["g_grad_ms"] = round(
        sync_time(g_grad, (g_params,) + g_args, args.iters) - floor, 1)
    out["d_fwd_ms"] = round(
        sync_time(d_fwd, (mpd_p, msd_p) + d_args, args.iters) - floor, 1)
    out["d_grad_ms"] = round(
        sync_time(d_grad, (mpd_p, msd_p) + d_args, args.iters) - floor, 1)
    ra, fa = batch["audio"], wav_fake
    out["mpd_fwd_ms"] = round(
        sync_time(mpd_fwd, (mpd_p, ra, fa), args.iters) - floor, 1)
    out["mpd_grad_ms"] = round(
        sync_time(mpd_grad, (mpd_p, ra, fa), args.iters) - floor, 1)
    out["msd_fwd_ms"] = round(
        sync_time(msd_fwd, (msd_p, state.msd_spectral, ra, fa),
                  args.iters) - floor, 1)
    out["msd_grad_ms"] = round(
        sync_time(msd_grad, (msd_p, state.msd_spectral, ra, fa),
                  args.iters) - floor, 1)
    out["full_gan_step_ms"] = round(
        time_step(step, state, max(3, args.iters // 2)) - floor, 1)
    print(json.dumps(out))
    from _bench_util import write_artifact
    print("wrote", write_artifact("gan_step", out))


if __name__ == "__main__":
    main()
