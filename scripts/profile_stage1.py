"""Stage-1 train-step composition profile at the REFERENCE operating point.

Attributes the recipe step (accum8 x b6 x T600, bench.measure_stage1_recipe)
to: frontend (ResNet3D) fwd / fwd+bwd, conformer trunk fwd / fwd+bwd, one
full micro fwd / grad, and the full 8-micro update — so MFU work targets
the segment that actually owns the time. By FLOP count the frontend is
~60% of the step (88x88 video convs), the conformer ~30%.

Method follows scripts/profile_gan.py: every sub-program takes its tensors
as ARGUMENTS (no device-array jit constants), returns one f32 scalar, and
the relay floor is measured and subtracted. BatchNorm runs in eval mode for
the isolated frontend probes (running stats; conv/matmul grads identical).

    python scripts/profile_stage1.py [--iters 5] [--bf16]
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
    ap.add_argument("--t", type=int, default=600)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.models.multi_target import MultiTargetModel

    cfg = preset("multi_target")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, conformer=dataclasses.replace(
                cfg.model.conformer, use_flash=True)))
    model = MultiTargetModel(cfg.model)

    b, t = args.b, args.t
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((b, t, 88, 88, 1)), dt)
    mask = np.ones((b, t), bool)
    spk = jnp.asarray(rng.standard_normal((b, 256)), dt)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           video[:1, :8], mask[:1, :8], spk[:1], train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if args.bf16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def scalar(x):
        return jnp.sum(x.astype(jnp.float32))

    def fe_apply(p, v):
        return model.apply({"params": p, "batch_stats": stats}, v, mask,
                           method=lambda m, vv, fm: m.extract_frontend(
                               vv, fm, train=False))

    @jax.jit
    def floor_fn(v):
        return scalar(v[0, 0, :8, :8, 0])

    @jax.jit
    def fe_fwd(p, v):
        return scalar(fe_apply(p, v))

    @jax.jit
    def fe_bwd(p, v):
        gr = jax.grad(lambda pp: jnp.sum(
            fe_apply(pp, v).astype(jnp.float32) ** 2))(p)
        return sum(jnp.sum(g.astype(jnp.float32) ** 2)
                   for g in jax.tree_util.tree_leaves(gr))

    feats = jnp.asarray(rng.standard_normal((b, 2 * t, cfg.model.conformer.dim)), dt)
    mask2 = np.ones((b, 2 * t), bool)

    def conf_apply(p, x):
        return model.apply(
            {"params": p, "batch_stats": stats}, x, mask2,
            method=lambda m, xx, fm: m.conformer(xx, fm, train=False)[0])

    @jax.jit
    def conf_fwd(p, x):
        return scalar(conf_apply(p, x))

    @jax.jit
    def conf_bwd(p, x):
        gr = jax.grad(lambda pp: jnp.sum(
            conf_apply(pp, x).astype(jnp.float32) ** 2))(p)
        return sum(jnp.sum(g.astype(jnp.float32) ** 2)
                   for g in jax.tree_util.tree_leaves(gr))

    # one full micro fwd/grad + the full recipe update via bench's setup
    import bench as bench_mod

    step, state, batch, _ = bench_mod._stage1_step_setup(
        8, b, t, uint8=True, bf16=args.bf16)
    batch_dev = jax.device_put(batch)

    floor = sync_time(floor_fn, (video,), args.iters)
    out = {"floor_ms": round(floor, 2), "b": b, "t": t, "bf16": args.bf16}

    def run(name, fn, a):
        ms = sync_time(fn, a, args.iters) - floor
        fl = flops_of(fn, a)
        out[name + "_ms"] = round(ms, 1)
        if fl:
            out[name + "_gflops"] = round(fl / 1e9, 1)

    run("frontend_fwd", fe_fwd, (params, video))
    run("frontend_fwdbwd", fe_bwd, (params, video))
    run("conformer_fwd", conf_fwd, (params, feats))
    run("conformer_fwdbwd", conf_bwd, (params, feats))
    ms = bench_mod._time_train_steps(step, state, batch_dev,
                                     jax.random.PRNGKey(1), args.iters) * 1e3
    out["full_update_ms"] = round(ms - floor, 1)
    print(json.dumps(out))
    from _bench_util import write_artifact
    print("wrote", write_artifact("stage1_step", out))


if __name__ == "__main__":
    main()
