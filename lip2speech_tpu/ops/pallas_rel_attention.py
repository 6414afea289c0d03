"""Pallas flash attention WITH Transformer-XL relative positions — the
conformer trunk's hot op.

The XL position score BD[i, j] = q_v[i] . p[(T-1) - i + j] only depends on
the diagonal (j - i), so for a (bq, bk) block pair it is one matmul against a
contiguous slice of the projected position table followed by a banded
extraction:

    Gp = q_v_blk @ p_pad[s : s + bq+bk].T       # (bq, bq+bk) lane-aligned
    BD[a, b] = Gp[a, bq - a + b]                # per-row shear

Mosaic cannot reshape/slice ragged (bq+bk-1)-wide tiles, so the shear is
decomposed into log2(bq+bk) STATIC pltpu.roll steps gated by the bits of the
per-row rotation amount (rotate row a left by bq-a; indices stay in
[1, bq+bk-1] so the rotation never wraps into read positions). p_pad carries
one never-read junk row at the front to keep Gp lane-aligned.

Scores = (AC + BD)/sqrt(dk) stream through an online softmax, so the (T, T)
score tensor never hits HBM (at T=1200 that is ~180 MB/layer saved).
Runs compiled on TPU; interpret mode elsewhere.

Training: `rel_flash_attention` carries a custom VJP — flash kernel on the
forward (nothing quadratic saved), dense recompute on the backward (the
(T, T) probabilities exist only transiently inside the backward, exactly
like a rematerialized dense layer). Gradients are those of the dense
reference math; parity vs autodiff-through-dense is tested in
tests/test_pallas_rel_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _band_extract(g: jnp.ndarray, bk: int) -> jnp.ndarray:
    """(bq, bq+bk-1) diagonal-band matrix -> (bq, bk) with
    out[a, b] = g[a, bq-1-a+b] (generalized rel_shift, verified vs gather).

    Reshape-trick form used by the interpret-mode tests; the compiled kernel
    uses the lane-aligned roll-shear (_band_extract_rolls)."""
    bq = g.shape[0]
    gp = jnp.pad(g, ((0, 0), (1, 0)))              # (bq, bq+bk)
    r = gp.reshape(bq + bk, bq)[1:, :]             # (bq+bk-1, bq)
    return r.reshape(bq, bq + bk - 1)[:, :bk]


def _band_extract_rolls(gp: jnp.ndarray, bk: int) -> jnp.ndarray:
    """(bq, bq+bk) lane-aligned matrix (col 0 never read) -> (bq, bk) with
    out[a, b] = gp[a, bq - a + b], via log2 static rolls (Mosaic-friendly)."""
    bq, w2 = gp.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, w2), 0)
    rot = (bq - rows) % w2
    x = gp
    shift = 1
    while shift < w2:
        rolled = pltpu.roll(x, w2 - shift, 1)      # left-rotate by `shift`
        x = jnp.where((rot & shift) > 0, rolled, x)
        shift *= 2
    return x[:, :bk]


def _kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref, o_ref,
            *, block_k: int, scale: float):
    """One (batch*head, q-block) program.

    qu/qv: (1, bq, dk); k/v: (1, T, dk); p: (1, 2T-1, dk); mask: (1, 1, T).
    """
    _, bq, dk = qu_ref.shape
    t = k_ref.shape[1]
    n_kb = t // block_k
    qi = pl.program_id(1) * bq

    qu = qu_ref[0, :, :]
    qv = qv_ref[0, :, :]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kj = kb * block_k
        k_blk = k_ref[0, pl.ds(kj, block_k), :]
        v_blk = v_ref[0, pl.ds(kj, block_k), :]
        mask_blk = mask_ref[0, 0, pl.ds(kj, block_k)]

        ac = jnp.dot(qu, k_blk.T, preferred_element_type=jnp.float32)
        # p_ref is the +1-junk-row padded table: rows [s, s+bq+bk) cover the
        # original [s-1, s+bq+bk-1); column 0 of g is never read
        s_start = t - qi - bq + kj
        p_slice = p_ref[0, pl.ds(s_start, bq + block_k), :]
        g = jnp.dot(qv, p_slice.T, preferred_element_type=jnp.float32)
        bd = _band_extract_rolls(g, block_k)

        s = (ac + bd) * scale
        s = jnp.where(mask_blk[None, :] > 0, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        pexp = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(pexp, axis=1)
        acc = acc * alpha[:, None] + jnp.dot(pexp, v_blk,
                                             preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((bq, dk), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[0, :, :] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)


def dense_rel_attention(q_u, q_v, k, v, p, mask):
    """Dense reference math (the exact non-flash conformer path): used as
    the interpret-mode oracle and as the recompute function in the VJP."""
    b, h, t, dk = q_u.shape
    scale = 1.0 / np.sqrt(dk)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, p)
    # generalized rel_shift: bd[..., i, j] wants table row (T-1) - i + j
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(b, h, 2 * t, t)[:, :, 1:, :]
    bd = bd.reshape(b, h, t, 2 * t - 1)[:, :, :, :t]
    s = (ac + bd) * scale
    m = mask[:, None, None, :]
    s = jnp.where(m, s, NEG_INF)
    attn = jax.nn.softmax(s, axis=-1)
    attn = jnp.where(m, attn, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _rel_flash_impl(
    q_u: jnp.ndarray,     # (B, H, T, dk)  query + pos_bias_u
    q_v: jnp.ndarray,     # (B, H, T, dk)  query + pos_bias_v
    k: jnp.ndarray,       # (B, H, T, dk)
    v: jnp.ndarray,       # (B, H, T, dk)
    p: jnp.ndarray,       # (H, 2T-1, dk)  projected position table (per head)
    mask: jnp.ndarray,    # (B, T) True = valid key
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, dk = q_u.shape
    scale = 1.0 / np.sqrt(dk)
    blk = min(block, max(8, t))
    t_pad = ((t + blk - 1) // blk) * blk
    if t_pad != t:
        pad4 = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q_u, q_v, k, v = (jnp.pad(x, pad4) for x in (q_u, q_v, k, v))
        mask = jnp.pad(mask, [(0, 0), (0, t_pad - t)])
        # re-center the position table for the padded length: build indices
        # T_pad-1 + (j - i) from the original T-1 + (j - i) table by edge-pad
        extra = t_pad - t
        p = jnp.pad(p, [(0, 0), (extra, extra), (0, 0)], mode="edge")

    qu = q_u.reshape(b * h, t_pad, dk)
    qv = q_v.reshape(b * h, t_pad, dk)
    kf = k.reshape(b * h, t_pad, dk)
    vf = v.reshape(b * h, t_pad, dk)
    maskf = jnp.repeat(mask.astype(jnp.int32), h, axis=0).reshape(b * h, 1, t_pad)
    # one junk row at the front keeps the in-kernel G matrix lane-aligned
    p = jnp.pad(p, [(0, 0), (1, 0), (0, 0)])            # (H, 2*t_pad, dk)

    grid = (b * h, t_pad // blk)
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=blk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t_pad, dk), lambda i, j: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dk), q_u.dtype),
        interpret=interpret,
    )(qu, qv, kf, vf, p, maskf)
    return out.reshape(b, h, t_pad, dk)[:, :, :t, :]


# ---------------------------------------------------------------------------
# differentiable entry point: flash forward, dense-recompute backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _rel_flash(block, interpret, q_u, q_v, k, v, p, mask):
    return _rel_flash_impl(q_u, q_v, k, v, p, mask,
                           block=block, interpret=interpret)


def _rel_flash_fwd(block, interpret, q_u, q_v, k, v, p, mask):
    out = _rel_flash_impl(q_u, q_v, k, v, p, mask,
                          block=block, interpret=interpret)
    return out, (q_u, q_v, k, v, p, mask)


def _rel_flash_bwd(block, interpret, residuals, g):
    q_u, q_v, k, v, p, mask = residuals
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: dense_rel_attention(a, b, c, d, e, mask),
        q_u, q_v, k, v, p)
    dq_u, dq_v, dk_, dv_, dp_ = vjp(g)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq_u, dq_v, dk_, dv_, dp_, dmask


_rel_flash.defvjp(_rel_flash_fwd, _rel_flash_bwd)


def rel_flash_attention(q_u, q_v, k, v, p, mask,
                        block: int = 128, interpret: bool = False):
    """Flash rel-attention, differentiable: Pallas kernel forward (O(T)
    memory, nothing quadratic saved), dense recompute in the backward —
    the (T, T) probabilities exist only transiently during grad."""
    return _rel_flash(block, interpret, q_u, q_v, k, v, p, mask)
