"""Decompose the bias-flash attention path at the stage-1 recipe shapes.

profile_conformer.py showed the bias impl SLOWER than the shear impl
(fwd 14.9 vs 4.5 ms at b6 h8 T1200 dk64) despite removing the in-kernel
shear. This times each piece standalone so the regression is attributed:

  * shear impl fwd / fwd+bwd      (the baseline being challenged)
  * bias impl fwd / fwd+bwd       (the full composition)
  * einsum  g = q_v @ p^T         (B,H,T,2T-1 f32)
  * xla_rel_shift(g)              (the pad/reshape/slice shear)
  * bias tile transpose           ((z,T,T) -> (z,n_kb,T,blk))
  * bias kernel alone             (bias precomputed as an argument)

    python scripts/profile_flash_bias.py [--iters 5] [--t 1200]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _bench_util import sync_time  # noqa: F401 (adds repo root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--b", type=int, default=6)
    ap.add_argument("--t", type=int, default=1200)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--only", default="", help="comma list of probe names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from lip2speech_tpu.ops import pallas_rel_attention as pra

    b, h, t, dk = args.b, args.heads, args.t, args.dk
    blk = args.block
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32))
    q_u, q_v = mk(b, h, t, dk), mk(b, h, t, dk)
    k, v = mk(b, h, t, dk), mk(b, h, t, dk)
    p = mk(h, 2 * t - 1, dk)
    mask = jnp.ones((b, t), bool)

    t_pad = ((t + blk - 1) // blk) * blk
    z = b * h
    n_kb = t_pad // blk
    g_full = mk(b, h, t_pad, 2 * t_pad - 1)
    bias_flat = mk(z, t_pad, t_pad)
    quf, kf, vf = mk(z, t_pad, dk), mk(z, t_pad, dk), mk(z, t_pad, dk)
    maskf = jnp.ones((z, 1, t_pad), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    probes = {}

    def flash(impl, do_grad):
        def f(qu_, qv_, k_, v_, p_):
            out = pra.rel_flash_attention(qu_, qv_, k_, v_, p_, mask,
                                          block=blk, impl=impl)
            return jnp.sum(out.astype(jnp.float32))
        if do_grad:
            gr = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))
            return lambda *a: sum(jnp.sum(x) for x in gr(*a))
        return jax.jit(f)

    probes["shear_fwd"] = (flash("shear", False), (q_u, q_v, k, v, p))
    probes["shear_fwdbwd"] = (flash("shear", True), (q_u, q_v, k, v, p))
    probes["bias_fwd"] = (flash("bias", False), (q_u, q_v, k, v, p))
    probes["bias_fwdbwd"] = (flash("bias", True), (q_u, q_v, k, v, p))

    @jax.jit
    def einsum_only(qv_, p_):
        g = jnp.einsum("bhtd,hsd->bhts", qv_, p_,
                       preferred_element_type=jnp.float32)
        return jnp.sum(g[:, :, ::311, ::311])

    probes["einsum_g"] = (einsum_only, (q_v, p))

    @jax.jit
    def shift_only(g):
        s = pra.xla_rel_shift(g)
        return jnp.sum(s[:, :, ::311, ::311])

    probes["rel_shift"] = (shift_only, (g_full,))

    @jax.jit
    def tile_only(bias):
        bt = bias.reshape(z, t_pad, n_kb, blk).transpose(0, 2, 1, 3)
        return jnp.sum(bt[:, :, ::311, ::31])

    probes["bias_tile"] = (tile_only, (bias_flat,))

    @jax.jit
    def kernel_only(qu_, k_, v_, bias):
        out = pra._flash_bias(blk, False, "kernel", 0.0,
                              qu_, k_, v_, bias, maskf, seed)
        return jnp.sum(out.astype(jnp.float32))

    probes["bias_kernel_fwd"] = (kernel_only, (quf, kf, vf, bias_flat))

    @jax.jit
    def kernel_fwdbwd(qu_, k_, v_, bias):
        gr = jax.grad(lambda *a: jnp.sum(pra._flash_bias(
            blk, False, "kernel", 0.0, *a, maskf, seed).astype(jnp.float32)),
            argnums=(0, 1, 2, 3))(qu_, k_, v_, bias)
        return sum(jnp.sum(x) for x in gr)

    probes["bias_kernel_fwdbwd"] = (kernel_fwdbwd, (quf, kf, vf, bias_flat))

    @jax.jit
    def floor_fn(xx):
        return jnp.sum(xx[0, 0, :8])

    floor = sync_time(floor_fn, (q_u,), args.iters)
    out = {"floor_ms": round(floor, 2), "b": b, "t": t, "h": h, "dk": dk,
           "block": blk}
    only = {s for s in args.only.split(",") if s}
    for name, (fn, a) in probes.items():
        if only and name not in only:
            continue
        ms = sync_time(fn, a, args.iters) - floor
        out[name + "_ms"] = round(ms, 2)
        print(json.dumps(out))  # progressive — each probe costs a compile

    print(json.dumps(out))
    from _bench_util import write_artifact
    print("wrote", write_artifact("flash_bias", out))


if __name__ == "__main__":
    main()
