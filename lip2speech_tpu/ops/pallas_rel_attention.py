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

Training: `rel_flash_attention` carries a custom VJP. The forward kernel
additionally emits the per-row log-sum-exp; the default backward
(bwd="kernel") is a fused Pallas kernel (_bwd_kernel) that recomputes each
score tile from the saved LSE and produces dQu/dQv/dK/dV and the position
-table gradient via the inverse band shear — O(T) memory end to end,
nothing quadratic ever in HBM. bwd="dense" keeps the dense-recompute VJP
as a fallback/oracle. Gradient parity vs autodiff-through-dense is exact
in interpret mode (tests/test_pallas_rel_attention.py); compiled on TPU
both forward and backward are bf16-class (~1e-3 relative — the MXU's
native precision), the accuracy regime bf16 training already lives in.
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


def _band_scatter_rolls(ds: jnp.ndarray, w2: int) -> jnp.ndarray:
    """Inverse of _band_extract_rolls: (bq, bk) band grads -> (bq, w2)
    with out[a, (bq - a + b) % w2] = ds[a, b] (zeros elsewhere).

    Right-rotating row a by rot_a undoes the extract's left rotation; the
    zero-padded columns [bk:] land on the never-read positions (incl. the
    junk column 0), so no explicit masking is needed."""
    bq, bk = ds.shape
    x = jnp.pad(ds, ((0, 0), (0, w2 - bk)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, w2), 0)
    rot = (rows - bq) % w2          # right-rotate by (bq - a) == left by this
    shift = 1
    while shift < w2:
        rolled = pltpu.roll(x, w2 - shift, 1)
        x = jnp.where((rot & shift) > 0, rolled, x)
        shift *= 2
    return x


def _scores_block(qu, qv, k_blk, p_slice, mask_blk, scale, block_k):
    """Masked (bq, bk) scores for one (q-block, k-block) pair — shared by
    the forward and both backward kernels."""
    ac = jnp.dot(qu, k_blk.T, preferred_element_type=jnp.float32)
    g = jnp.dot(qv, p_slice.T, preferred_element_type=jnp.float32)
    bd = _band_extract_rolls(g, block_k)
    s = (ac + bd) * scale
    return jnp.where(mask_blk[None, :] > 0, s, NEG_INF)


def _keep_mask(shape, rate: float):
    """Per-element keep mask / (1-rate) from the seeded in-kernel PRNG.
    Caller must have run pltpu.prng_seed; generation ORDER is part of the
    fwd/bwd contract (same seed + same sequence of calls = same masks)."""
    thresh = np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    bits = pltpu.prng_random_bits(shape)
    # int32 -> uint32 astype wraps mod 2^32 (same bit pattern)
    keep = (bits.astype(jnp.uint32) >= thresh).astype(jnp.float32)
    return keep * (1.0 / (1.0 - rate))


def _kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref,
            o_ref, lse_ref, *, block_k: int, scale: float,
            dropout_rate: float):
    """One (batch*head, q-block) program.

    qu/qv: (1, bq, dk); k/v: (1, T, dk); p: (1, 2T-1, dk); mask: (1, 1, T).
    Also emits the per-row log-sum-exp (the backward pass's softmax state).
    dropout_rate > 0 drops attention PROBABILITIES (normalizer l is always
    computed from the undropped terms, matching dense softmax->dropout
    order); masks come from the in-kernel PRNG seeded per (bh, q-block).
    """
    _, bq, dk = qu_ref.shape
    t = k_ref.shape[1]
    n_kb = t // block_k
    qi = pl.program_id(1) * bq
    if dropout_rate > 0.0:
        # single-argument seed (this Mosaic rejects varargs prng_seed):
        # mix (user seed, bh program, q-block) with distinct odd constants
        pltpu.prng_seed(seed_ref[0] * 1000003
                        + pl.program_id(0) * 7919 + pl.program_id(1))

    qu = qu_ref[0, :, :]
    qv = qv_ref[0, :, :]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kj = pl.multiple_of(kb * block_k, block_k)
        k_blk = k_ref[0, pl.ds(kj, block_k), :]
        v_blk = v_ref[0, pl.ds(kj, block_k), :]
        mask_blk = mask_ref[0, 0, pl.ds(kj, block_k)]

        # p_ref is the +1-junk-row padded table: rows [s, s+bq+bk) cover the
        # original [s-1, s+bq+bk-1); column 0 of g is never read.
        # multiple_of: every term is a block multiple, but the value flows
        # through the fori_loop carry and Mosaic's alignment prover gives up
        # on it under bf16 tiling ("index in dimension 1 is a multiple of 8")
        s_start = pl.multiple_of(t - qi - bq + kj, block_k)
        p_slice = p_ref[0, pl.ds(s_start, bq + block_k), :]
        s = _scores_block(qu, qv, k_blk, p_slice, mask_blk, scale, block_k)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        pexp = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(pexp, axis=1)
        pexp_v = (pexp * _keep_mask((bq, block_k), dropout_rate)
                  if dropout_rate > 0.0 else pexp)
        acc = acc * alpha[:, None] + jnp.dot(pexp_v, v_blk,
                                             preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((bq, dk), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[0, :, :] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)
    # rows with no valid key keep m = NEG_INF, so lse stays ~NEG_INF with
    # no boolean select (Mosaic: no 1-D i1 minor-dim inserts)
    lse_ref[0, 0, :] = m + jnp.log(jnp.maximum(l, 1e-20))


def _bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref,
                lse_ref, o_ref, do_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref,
                *, block_q: int, block_k: int, scale: float,
                dropout_rate: float):
    """One batch*head program: the FULL flash backward, O(T) memory.

    Recomputes each (q-block, k-block) score tile from the forward's saved
    log-sum-exp (P = exp(S - lse)), then
        dS = P o (dO V^T - D),  D = rowsum(dO o O)
        dQu = dS K,  dK = dS^T Qu,  dV = P^T dO          (all * scale where due)
        dQv = scatter(dS) P_slice,  dP_tbl = scatter(dS)^T Qv
    where scatter() is the inverse of the band shear (_band_scatter_rolls).
    dK/dV/dP accumulate across q-blocks in VMEM; nothing quadratic is ever
    materialized."""
    t = qu_ref.shape[1]
    n_qb = t // block_q
    n_kb = t // block_k

    dk_ref[0, :, :] = jnp.zeros_like(dk_ref[0, :, :])
    dv_ref[0, :, :] = jnp.zeros_like(dv_ref[0, :, :])
    dp_ref[0, :, :] = jnp.zeros_like(dp_ref[0, :, :])

    def q_body(qb, _):
        qi = pl.multiple_of(qb * block_q, block_q)
        qu = qu_ref[0, pl.ds(qi, block_q), :]
        qv = qv_ref[0, pl.ds(qi, block_q), :]
        do_blk = do_ref[0, pl.ds(qi, block_q), :].astype(jnp.float32)
        o_blk = o_ref[0, pl.ds(qi, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi, block_q)]
        dvec = jnp.sum(do_blk * o_blk, axis=1)
        if dropout_rate > 0.0:
            # replay the forward's PRNG stream: same (bh, q-block) seed
            # mixing, same per-k-block generation order
            pltpu.prng_seed(seed_ref[0] * 1000003
                            + pl.program_id(0) * 7919 + qb)

        def k_body(kb, carry):
            dqu_acc, dqv_acc = carry
            kj = pl.multiple_of(kb * block_k, block_k)
            k_blk = k_ref[0, pl.ds(kj, block_k), :]
            v_blk = v_ref[0, pl.ds(kj, block_k), :]
            mask_blk = mask_ref[0, 0, pl.ds(kj, block_k)]
            # multiple_of: see the forward kernel's note on the band offset
            s_start = pl.multiple_of(t - qi - block_q + kj, block_k)
            p_slice = p_ref[0, pl.ds(s_start, block_q + block_k), :]

            s = _scores_block(qu, qv, k_blk, p_slice, mask_blk, scale,
                              block_k)
            # broadcast lse to 2-D BEFORE any boolean op (Mosaic cannot
            # minor-dim-insert 1-D i1 vectors); fully-masked rows get
            # p_row = 0
            lse2 = jax.lax.broadcast_in_dim(lse, s.shape, (0,))
            valid2 = lse2 > NEG_INF / 2
            p_row = jnp.where(valid2, jnp.exp(s - jnp.where(valid2, lse2,
                                                            0.0)), 0.0)
            dp_blk = jnp.dot(do_blk, v_blk.T.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                keep = _keep_mask(p_row.shape, dropout_rate)
                p_drop = p_row * keep        # P-tilde, as applied in fwd
                dp_blk = dp_blk * keep       # cotangent through the mask
            else:
                p_drop = p_row
            ds_s = p_row * (dp_blk - dvec[:, None]) * scale

            dqu_acc = dqu_acc + jnp.dot(ds_s, k_blk.astype(jnp.float32),
                                        preferred_element_type=jnp.float32)
            dk_ref[0, pl.ds(kj, block_k), :] += jnp.dot(
                ds_s.T, qu.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            dv_ref[0, pl.ds(kj, block_k), :] += jnp.dot(
                p_drop.T, do_blk, preferred_element_type=jnp.float32)

            dg = _band_scatter_rolls(ds_s, block_q + block_k)
            dqv_acc = dqv_acc + jnp.dot(dg, p_slice.astype(jnp.float32),
                                        preferred_element_type=jnp.float32)
            dp_ref[0, pl.ds(s_start, block_q + block_k), :] += jnp.dot(
                dg.T, qv.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            return dqu_acc, dqv_acc

        z = jnp.zeros((block_q, qu_ref.shape[2]), jnp.float32)
        dqu_acc, dqv_acc = jax.lax.fori_loop(0, n_kb, k_body, (z, z))
        dqu_ref[0, pl.ds(qi, block_q), :] = dqu_acc
        dqv_ref[0, pl.ds(qi, block_q), :] = dqv_acc
        return 0

    jax.lax.fori_loop(0, n_qb, q_body, 0)


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


def _pad_inputs(q_u, q_v, k, v, p, mask, block):
    """Pad T up to a block multiple; re-center + junk-pad the position
    table. Returns flattened (b*h, ...) tensors ready for the kernels."""
    b, h, t, dk = q_u.shape
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
    return qu, qv, kf, vf, p, maskf, blk, t_pad


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "return_lse", "dropout_rate"))
def _rel_flash_impl(
    q_u: jnp.ndarray,     # (B, H, T, dk)  query + pos_bias_u
    q_v: jnp.ndarray,     # (B, H, T, dk)  query + pos_bias_v
    k: jnp.ndarray,       # (B, H, T, dk)
    v: jnp.ndarray,       # (B, H, T, dk)
    p: jnp.ndarray,       # (H, 2T-1, dk)  projected position table (per head)
    mask: jnp.ndarray,    # (B, T) True = valid key
    block: int = 128,
    interpret: bool = False,
    return_lse: bool = False,
    dropout_rate: float = 0.0,
    seed: jnp.ndarray | None = None,
):
    if dropout_rate > 0.0 and interpret:
        raise NotImplementedError(
            "in-kernel attention dropout needs the TPU PRNG (interpret-mode "
            "prng_random_bits is stubbed); use the dense path off-TPU")
    b, h, t, dk = q_u.shape
    scale = 1.0 / np.sqrt(dk)
    qu, qv, kf, vf, pp, maskf, blk, t_pad = _pad_inputs(
        q_u, q_v, k, v, p, mask, block)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    grid = (b * h, t_pad // blk)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, block_k=blk, scale=scale,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t_pad, dk), lambda i, j: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t_pad, dk), q_u.dtype),
            jax.ShapeDtypeStruct((b * h, 1, t_pad), jnp.float32),
        ],
        interpret=interpret,
    )(seed.astype(jnp.int32), qu, qv, kf, vf, pp, maskf)
    out = out.reshape(b, h, t_pad, dk)[:, :, :t, :]
    if return_lse:
        return out, lse.reshape(b, h, t_pad)[:, :, :t]
    return out


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "dropout_rate"))
def _rel_flash_bwd_impl(q_u, q_v, k, v, p, mask, lse, out, g,
                        block: int = 128, interpret: bool = False,
                        dropout_rate: float = 0.0, seed=None):
    """Flash backward: one fused Pallas kernel per batch*head program."""
    b, h, t, dk = q_u.shape
    scale = 1.0 / np.sqrt(dk)
    qu, qv, kf, vf, pp, maskf, blk, t_pad = _pad_inputs(
        q_u, q_v, k, v, p, mask, block)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    extra = t_pad - t
    pad3 = [(0, 0), (0, 0), (0, extra), (0, 0)]
    of = jnp.pad(out, pad3).reshape(b * h, t_pad, dk)
    gf = jnp.pad(g, pad3).reshape(b * h, t_pad, dk)
    lsef = jnp.pad(lse, [(0, 0), (0, 0), (0, extra)],
                   constant_values=NEG_INF).reshape(b * h, 1, t_pad)

    full = lambda i: (i, 0, 0)          # noqa: E731
    spec3 = pl.BlockSpec((1, t_pad, dk), full, memory_space=pltpu.VMEM)
    dqu, dqv, dkk, dvv, dpp = pl.pallas_call(
        functools.partial(_bwd_kernel, block_q=blk, block_k=blk, scale=scale,
                          dropout_rate=dropout_rate),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec3, spec3, spec3, spec3,
            pl.BlockSpec((1, 2 * t_pad, dk), lambda i: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec3, spec3,
        ],
        out_specs=[spec3, spec3, spec3, spec3,
                   pl.BlockSpec((1, 2 * t_pad, dk), full,
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 2 * t_pad, dk), jnp.float32),
        ],
        # the fused per-batch*head program holds ~13 arrays of (T, dk) rows
        # in VMEM at once; at T≈2400 that exceeds Mosaic's default 16 MiB
        # scoped budget, so raise it toward the chip's physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed.astype(jnp.int32), qu, qv, kf, vf, pp, maskf, lsef, of, gf)

    unflat = lambda x: x.reshape(b, h, t_pad, dk)[:, :, :t, :]  # noqa: E731
    dq_u = unflat(dqu).astype(q_u.dtype)
    dq_v = unflat(dqv).astype(q_v.dtype)
    dk_ = unflat(dkk).astype(k.dtype)
    dv_ = unflat(dvv).astype(v.dtype)
    # dp: sum the per-(b,h) partials over b, then strip the junk row and the
    # edge re-centering — valid positions are rows [1+extra, extra+2t)
    dp_ = dpp.reshape(b, h, 2 * t_pad, dk).sum(axis=0)
    dp_ = dp_[:, 1 + extra: extra + 2 * t, :].astype(p.dtype)
    return dq_u, dq_v, dk_, dv_, dp_


# ---------------------------------------------------------------------------
# differentiable entry point: flash forward, flash (or dense-remat) backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _rel_flash(block, interpret, bwd, dropout_rate, q_u, q_v, k, v, p, mask,
               seed):
    return _rel_flash_impl(q_u, q_v, k, v, p, mask,
                           block=block, interpret=interpret,
                           dropout_rate=dropout_rate, seed=seed)


def _rel_flash_fwd(block, interpret, bwd, dropout_rate,
                   q_u, q_v, k, v, p, mask, seed):
    out, lse = _rel_flash_impl(q_u, q_v, k, v, p, mask,
                               block=block, interpret=interpret,
                               return_lse=True, dropout_rate=dropout_rate,
                               seed=seed)
    return out, (q_u, q_v, k, v, p, mask, lse, out, seed)


def _rel_flash_bwd(block, interpret, bwd, dropout_rate, residuals, g):
    q_u, q_v, k, v, p, mask, lse, out, seed = residuals
    if bwd == "kernel" or dropout_rate > 0.0:
        # dropout REQUIRES the kernel backward: only it can replay the
        # in-kernel PRNG masks
        dq_u, dq_v, dk_, dv_, dp_ = _rel_flash_bwd_impl(
            q_u, q_v, k, v, p, mask, lse, out, g,
            block=block, interpret=interpret, dropout_rate=dropout_rate,
            seed=seed)
    else:
        # dense rematerialization: the (T, T) probabilities exist only
        # transiently inside this backward, like a rematerialized layer
        _, vjp = jax.vjp(
            lambda a, b, c, d, e: dense_rel_attention(a, b, c, d, e, mask),
            q_u, q_v, k, v, p)
        dq_u, dq_v, dk_, dv_, dp_ = vjp(g)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq_u, dq_v, dk_, dv_, dp_, dmask, dseed


_rel_flash.defvjp(_rel_flash_fwd, _rel_flash_bwd)


# ---------------------------------------------------------------------------
# multi-device meshes: Mosaic kernels cannot be auto-partitioned by GSPMD
# (jax tpu_custom_call.py raises "Mosaic kernels cannot be automatically
# partitioned. Please wrap the call in a shard_map."), so inside a
# multi-device jitted program this kernel must run under a shard_map that
# makes EVERY mesh axis manual. The train-step builders declare their mesh
# here; rel_flash_attention then self-wraps with batch over 'data' and
# heads over 'model' — exactly the layout GSPMD propagates from the
# head-parallel TP weight rules (parallel/sharding_rules.py), so the
# shard_map boundary inserts no resharding.
# ---------------------------------------------------------------------------

_FLASH_MESH = None


def set_flash_mesh(mesh) -> None:
    """Declare the mesh whose jitted programs will contain this kernel
    (None clears it). Axes must be named 'data' / 'model' (parallel/mesh)."""
    global _FLASH_MESH
    _FLASH_MESH = mesh


def _shard_mapped_flash(mesh, block, interpret, bwd, dropout_rate,
                        q_u, q_v, k, v, p, mask, seed):
    from jax.sharding import PartitionSpec as P

    from lip2speech_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    b, h = q_u.shape[0], q_u.shape[1]
    ndata = mesh.shape.get(DATA_AXIS, 1)
    nmodel = mesh.shape.get(MODEL_AXIS, 1)
    # shard only dims the mesh divides; the rest replicate (matches the
    # per-leaf divisibility fallback in sharding_rules.shard_params)
    bax = DATA_AXIS if (ndata > 1 and b % ndata == 0) else None
    hax = MODEL_AXIS if (nmodel > 1 and h % nmodel == 0) else None
    qspec = P(bax, hax, None, None)
    pspec = P(hax, None, None)
    mspec = P(bax, None)

    def inner(q_u, q_v, k, v, p, mask, seed):
        # distinct in-kernel dropout stream per shard (the kernel PRNG is
        # seeded per call; without this every batch shard would replay the
        # same mask pattern)
        if bax is not None:
            seed = seed + jax.lax.axis_index(DATA_AXIS) * nmodel
        if hax is not None:
            seed = seed + jax.lax.axis_index(MODEL_AXIS)
        return _rel_flash(block, interpret, bwd, dropout_rate,
                          q_u, q_v, k, v, p, mask, seed)

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(qspec, qspec, qspec, qspec, pspec, mspec, P(None)),
        out_specs=qspec, check_vma=False)(q_u, q_v, k, v, p, mask, seed)


def rel_flash_attention(q_u, q_v, k, v, p, mask,
                        block: int = 128, interpret: bool = False,
                        bwd: str = "kernel", dropout_rate: float = 0.0,
                        dropout_seed=None):
    """Flash rel-attention, differentiable. Forward: Pallas online-softmax
    kernel (O(T) memory, saves only out + log-sum-exp). Backward:
    bwd="kernel" (default) runs the fused flash backward kernel
    (_bwd_kernel) — nothing quadratic ever hits HBM; bwd="dense" falls back
    to dense recompute of the probabilities inside the VJP.

    dropout_rate > 0 applies attention-probability dropout INSIDE the
    kernels via the TPU PRNG (the reference recipe's attention_dropout);
    masks are regenerated identically in the backward from dropout_seed
    (an int32 scalar/1-vector). TPU-only (interpret-mode PRNG is stubbed)."""
    if q_u.shape[2] < block and not interpret:
        # Tiny sequences (< one k-block, e.g. a pipeline init forward at
        # T=16) shrink the kernel's block to T, and Mosaic then rejects the
        # sub-128-lane i32 mask load ("cannot statically prove that index in
        # dimension 2 is a multiple of 128"). Flash buys nothing below one
        # block anyway — run the dense reference path (differentiable, same
        # math; dropout at these call sites is inference-off).
        if dropout_rate > 0.0:
            raise NotImplementedError(
                "in-kernel attention dropout needs T >= block "
                f"(got T={q_u.shape[2]} < block={block})")
        return dense_rel_attention(q_u, q_v, k, v, p, mask)
    if dropout_seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    if (_FLASH_MESH is not None and _FLASH_MESH.size > 1
            and not jax.sharding.get_abstract_mesh().manual_axes):
        # already-manual traces (a caller's own shard_map) skip the wrap —
        # nesting shard_map inside shard_map is illegal
        return _shard_mapped_flash(_FLASH_MESH, block, interpret, bwd,
                                   dropout_rate, q_u, q_v, k, v, p, mask,
                                   seed)
    return _rel_flash(block, interpret, bwd, dropout_rate,
                      q_u, q_v, k, v, p, mask, seed)
