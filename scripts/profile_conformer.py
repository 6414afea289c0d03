"""Conformer sub-layer attribution at the stage-1 recipe shapes.

profile_stage1.py showed the conformer trunk is the stage-1 step's weak
segment (fwd+bwd ~15 TF/s vs the frontend's 37). This times each sub-layer
of ONE ConformerLayer standalone at (b=6, T=1200, d=512, ffn=2048, h=8,
k=31) so the slow component is identified before any optimization:

  * full ConformerLayer (flash on / off)
  * FeedForward (the lane-friendly 512x2048 matmuls — expected near peak)
  * RelPositionMultiHeadAttention, flash kernel vs dense XL path
  * ConvModule, and its depthwise k31 groups=512 conv alone

Method per scripts/_bench_util.py: tensors as arguments, one f32 scalar
out, relay floor subtracted, deterministic mode (dropout off) so segment
deltas are pure compute — the recipe step itself runs dropout, which adds
bandwidth but no matmuls.

    python scripts/profile_conformer.py [--iters 5] [--bf16] [--t 1200]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _bench_util import flops_of, sync_time  # noqa: F401 (adds repo root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--b", type=int, default=6)
    ap.add_argument("--t", type=int, default=1200)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--ffn", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--only", default="", help="comma list of probe names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from lip2speech_tpu.models.conformer import (
        ConformerLayer, ConvModule, FeedForward, RelPositionMultiHeadAttention)
    from lip2speech_tpu.models.layers import Conv1d
    from lip2speech_tpu.ops import nn as ops

    b, t, d = args.b, args.t, args.dim
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), dt)
    pe = jnp.asarray(ops.sinusoidal_rel_pos_encoding(t, d), dt)
    mask = np.ones((b, t), bool)
    key = jax.random.PRNGKey(0)

    def cast(params):
        if not args.bf16:
            return params
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, params)

    probes = {}

    def add(name, module, call):
        variables = module.init({"params": key, "dropout": key}, *call(x))
        params = cast(variables.get("params", {}))
        stats = variables.get("batch_stats", {})

        def apply(p, xx):
            return module.apply({"params": p, "batch_stats": stats},
                                *call(xx))

        @jax.jit
        def fwd(p, xx):
            return jnp.sum(apply(p, xx).astype(jnp.float32))

        @jax.jit
        def bwd(p, xx):
            gr = jax.grad(lambda pp: jnp.sum(
                apply(pp, xx).astype(jnp.float32) ** 2))(p)
            return sum(jnp.sum(g.astype(jnp.float32) ** 2)
                       for g in jax.tree_util.tree_leaves(gr))

        probes[name] = (fwd, bwd, params)

    layer_kw = dict(dim=d, ffn_dim=args.ffn, heads=args.heads,
                    dropout=0.0, attention_dropout=0.0)
    add("layer_flash",
        ConformerLayer(**layer_kw, use_flash=True),
        lambda xx: (xx, pe, mask))
    add("layer_dense",
        ConformerLayer(**layer_kw, use_flash=False),
        lambda xx: (xx, pe, mask))
    add("ffn", FeedForward(d, args.ffn), lambda xx: (xx,))
    add("attn_flash",
        RelPositionMultiHeadAttention(d, args.heads, use_flash=True),
        lambda xx: (xx, pe, mask))
    add("attn_dense",
        RelPositionMultiHeadAttention(d, args.heads, use_flash=False),
        lambda xx: (xx, pe, mask))
    add("conv_module", ConvModule(d), lambda xx: (xx,))
    add("depthwise",
        Conv1d(d, 31, padding=15, groups=d),
        lambda xx: (xx,))

    @jax.jit
    def floor_fn(xx):
        return jnp.sum(xx[0, 0, :8].astype(jnp.float32))

    floor = sync_time(floor_fn, (x,), args.iters)
    out = {"floor_ms": round(floor, 2), "b": b, "t": t, "dim": d,
           "bf16": args.bf16}
    only = {s for s in args.only.split(",") if s}
    for name, (fwd, bwd, params) in probes.items():
        if only and name not in only:
            continue
        for tag, fn in (("fwd", fwd), ("fwdbwd", bwd)):
            ms = sync_time(fn, (params, x), args.iters) - floor
            out[f"{name}_{tag}_ms"] = round(ms, 2)
            fl = flops_of(fn, (params, x))
            if fl:
                out[f"{name}_{tag}_gflops"] = round(fl / 1e9, 1)
        print(json.dumps(out))  # progressive — each probe costs a compile

    print(json.dumps(out))
    from _bench_util import write_artifact
    print("wrote", write_artifact("conformer_segments", out))


if __name__ == "__main__":
    main()
