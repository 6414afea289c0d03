"""Pallas flash-attention kernel for the wav2vec2-style trunks.

Blockwise online-softmax attention (never materializes the (T, T) score
matrix in HBM) for the AV-HuBERT / HuBERT transformer encoders. At the
reference's sequence lengths (<= 600 video frames / 1200 audio frames) the
score tensors are up to B*H*T^2*4B ~ 180 MB/layer — this kernel keeps them
in VMEM tiles.

The conformer's relative-position attention keeps its XLA path (the XL shift
term needs a banded gather per block pair; planned for a later round).

Falls back transparently to the jnp reference implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, scale: float):
    """One (batch*head, q-block) program: online softmax over key blocks.

    Block shapes (leading singleton = the batch*head block dim):
    q_ref: (1, bq, dk); k_ref/v_ref: (1, T, dk); mask_ref: (1, 1, T) int32;
    o_ref: (1, bq, dk).
    """
    _, bq, dk = q_ref.shape
    t = k_ref.shape[1]
    n_kb = t // block_k

    q = q_ref[0, :, :] * scale

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        mask_blk = mask_ref[0, 0, pl.ds(kb * block_k, block_k)]

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)      # (bq, bk)
        s = jnp.where(mask_blk[None, :] > 0, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((bq, dk), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[0, :, :] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,       # (B, H, T, dk)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,    # (B, T) bool, True = valid key
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, dk = q.shape
    scale = 1.0 / np.sqrt(dk)

    # pad T to a block multiple; padded keys masked out, padded queries dropped
    bq = min(block_q, max(8, t))
    bk = min(block_k, max(8, t))
    t_pad = ((t + max(bq, bk) - 1) // max(bq, bk)) * max(bq, bk)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, t_pad - t)])

    qf = q.reshape(b * h, t_pad, dk)
    kf = k.reshape(b * h, t_pad, dk)
    vf = v.reshape(b * h, t_pad, dk)
    maskf = jnp.repeat(mask.astype(jnp.int32), h, axis=0).reshape(b * h, 1, t_pad)

    grid = (b * h, t_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_k=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dk), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dk), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, t_pad, dk)[:, :, :t, :]


def reference_attention(q, k, v, mask):
    """jnp oracle: plain masked softmax attention (fairseq semantics)."""
    dk = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_diff(interpret, q, k, v, mask):
    return flash_attention(q, k, v, mask, interpret=interpret)


def _flash_diff_fwd(interpret, q, k, v, mask):
    return flash_attention(q, k, v, mask, interpret=interpret), (q, k, v, mask)


def _flash_diff_bwd(interpret, residuals, g):
    # dense rematerialization: a bare pallas_call has no autodiff rule, and
    # at these lengths the transient (T, T) probabilities are fine in bwd
    q, k, v, mask = residuals
    _, vjp = jax.vjp(lambda a, b, c: reference_attention(a, b, c, mask),
                     q, k, v)
    dq, dk_, dv = vjp(g)
    return dq, dk_, dv, np.zeros(mask.shape, dtype=jax.dtypes.float0)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(q, k, v, mask, use_pallas: bool | None = None):
    """Dispatch: Pallas kernel on TPU, jnp elsewhere. Differentiable either
    way (the kernel path carries a dense-recompute VJP)."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        return _flash_diff(False, q, k, v, mask)
    return reference_attention(q, k, v, mask)
