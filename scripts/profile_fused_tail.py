"""A/B: fused resblock-trio Pallas kernel vs the plain XLA folded tail.

Vocoder forward at the serving configuration — batch 4 x 9.6 s (Tc=480
codes -> 153600 samples), bf16 params + compute. The fused kernel
(`ops/pallas_fused_tail.py`) runs each upsample stage's three ResBlock1
modules as one Pallas kernel (design + CPU-interpret parity: NOTES.md
"Fused resblock-trio Pallas kernel"); this script provides the chip
numbers. Relay floor is measured with a scalar-fetch jit on the same
input and subtracted (axon rules — NOTES.md "Environment gotchas").

    python scripts/profile_fused_tail.py [--iters 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np

from _bench_util import sync_time  # noqa: F401 (adds repo root to sys.path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--codes", type=int, default=480)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.models.vocoder import MelCodeGenerator

    cfg0 = preset("multi_target").vocoder
    b, tc = args.batch, args.codes
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, 200, (b, tc)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((b, 2 * tc, 80)), jnp.bfloat16)
    spk = jnp.asarray(rng.standard_normal((b, 256)), jnp.bfloat16)

    @jax.jit
    def floor_fn(c):
        return jnp.sum(c[:1, :8].astype(jnp.float32))

    floor = sync_time(floor_fn, (code,), args.iters)
    out = {"floor_ms": round(floor, 2),
           "shape": f"b{b} x Tc{tc} ({tc * 320 / 16000:.1f} s audio)"}

    for name, fused in (("xla", False), ("fused", True)):
        cfg = dataclasses.replace(cfg0, fused_tail_kernel=fused)
        gen = MelCodeGenerator(cfg)
        variables = gen.init(jax.random.PRNGKey(0), code, mel, spk)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables["params"])

        @jax.jit
        def fwd(p, c, m, s, gen=gen):
            wav = gen.apply({"params": p}, c, m, s, deterministic=True)
            return jnp.sum(wav.astype(jnp.float32) ** 2)

        try:
            t = sync_time(fwd, (params, code, mel, spk), args.iters)
            out[f"vocoder_{name}_ms"] = round(t - floor, 1)
        except Exception as e:  # noqa: BLE001
            out[f"vocoder_{name}_ms"] = f"error: {str(e)[:300]}"

    print(json.dumps(out))
    from _bench_util import write_artifact
    print("wrote", write_artifact("fused_tail", out))


if __name__ == "__main__":
    main()
