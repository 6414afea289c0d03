"""Parameter sharding rules: tensor parallelism for the transformer stacks.

The reference has no TP (SURVEY.md §2.7) — data parallelism only. On TPU we
get TP for free from GSPMD by annotating weight shardings over the mesh's
'model' axis and letting XLA insert the collectives:

  FFN:      w_1 (d, ffn) -> P(None, 'model')   column-parallel
            w_2 (ffn, d) -> P('model', None)   row-parallel (psum at output)
  attention q/k/v (d, d) -> P(None, 'model')   heads split over 'model'
            out   (d, d) -> P('model', None)

Everything else (norms, biases, convs, embeddings) is replicated. With
model=1 the specs all collapse to replication, so the rules are always safe
to apply.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lip2speech_tpu.parallel.mesh import MODEL_AXIS

# (path-suffix match, spec) — first hit wins; checked against the joined path
_RULES = [
    # conformer FFN
    (("feed_forward", "w_1", "weight"), P(None, MODEL_AXIS)),
    (("feed_forward", "w_1", "bias"), P(MODEL_AXIS)),
    (("feed_forward", "w_2", "weight"), P(MODEL_AXIS, None)),
    (("feed_forward_macaron", "w_1", "weight"), P(None, MODEL_AXIS)),
    (("feed_forward_macaron", "w_1", "bias"), P(MODEL_AXIS)),
    (("feed_forward_macaron", "w_2", "weight"), P(MODEL_AXIS, None)),
    # conformer attention (head-parallel)
    (("self_attn", "linear_q", "weight"), P(None, MODEL_AXIS)),
    (("self_attn", "linear_k", "weight"), P(None, MODEL_AXIS)),
    (("self_attn", "linear_v", "weight"), P(None, MODEL_AXIS)),
    (("self_attn", "linear_out", "weight"), P(MODEL_AXIS, None)),
    # wav2vec2-style attention/FFN
    (("self_attn", "q_proj", "weight"), P(None, MODEL_AXIS)),
    (("self_attn", "k_proj", "weight"), P(None, MODEL_AXIS)),
    (("self_attn", "v_proj", "weight"), P(None, MODEL_AXIS)),
    (("self_attn", "out_proj", "weight"), P(MODEL_AXIS, None)),
    (("fc1", "weight"), P(None, MODEL_AXIS)),
    (("fc1", "bias"), P(MODEL_AXIS)),
    (("fc2", "weight"), P(MODEL_AXIS, None)),
]


def _spec_for(path: tuple[str, ...], leaf) -> P:
    for suffix, spec in _RULES:
        if len(path) >= len(suffix) and tuple(path[-len(suffix):]) == suffix:
            return spec
    return P()


def param_specs(params) -> object:
    """PartitionSpec tree for a parameter pytree."""

    def fn(path, leaf):
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        spec = _spec_for(keys, leaf)
        # drop specs whose sharded dims don't divide the mesh later (handled
        # at shard time); here just match rank
        if len(spec) > leaf.ndim:
            return P()
        return spec

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_params(params, mesh: Mesh):
    """Device-put params with TP specs over the mesh (replicated elsewhere)."""
    specs = param_specs(params)
    model_size = mesh.shape[MODEL_AXIS]

    def put(leaf, spec):
        if model_size > 1 and any(s == MODEL_AXIS for s in spec):
            # verify divisibility; fall back to replication if not divisible
            for axis_idx, axis_name in enumerate(spec):
                if axis_name == MODEL_AXIS and leaf.shape[axis_idx] % model_size:
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, specs)


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree (for jit in_shardings)."""
    specs = param_specs(params)
    model_size = mesh.shape[MODEL_AXIS]

    def to_sharding(leaf, spec):
        if model_size > 1 and any(s == MODEL_AXIS for s in spec):
            for axis_idx, axis_name in enumerate(spec):
                if axis_name == MODEL_AXIS and leaf.shape[axis_idx] % model_size:
                    spec = P()
                    break
        elif model_size == 1:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(to_sharding, params, specs)
