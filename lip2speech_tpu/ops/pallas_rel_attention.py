"""Pallas flash attention WITH Transformer-XL relative positions — the
conformer trunk's hot op.

The XL position score BD[i, j] = q_v[i] . p[(T-1) - i + j] only depends on
the diagonal (j - i), so for a q-block of bq rows it is ONE matmul against a
contiguous (bq+T)-row window of the projected position table followed by a
banded extraction over the whole row:

    Gp = q_v_blk @ p_pad[s0 : s0 + bq+T].T      # (bq, bq+T) lane-aligned
    BD[a, j] = Gp[a, bq - a + j]                # per-row shear, j in [0, T)

Mosaic cannot reshape/slice ragged diagonals, so the shear is decomposed
into STATIC pltpu.roll steps gated by the bits of the per-row rotation
amount. The rotation is bq - a <= bq, so only log2(bq)+1 roll+where passes
are needed, ONCE per q-block (an earlier per-(q, k)-block-pair variant paid
log2(bq+bk) passes per PAIR — measured ~75% of kernel time in shear lane
shuffles at the training shapes; see NOTES "flash shear hoist"). p_pad
carries one never-read junk row at the front to keep Gp lane-aligned.

Each program computes its full (bq, T) masked score row in VMEM with three
MXU matmuls + one shear, takes a plain row softmax, and multiplies into V —
the (T, T) score tensor never hits HBM (at T=1200 that is ~180 MB/layer
saved). Runs compiled on TPU; interpret mode elsewhere.

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
import os

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


def _band_extract_row_rolls(g: jnp.ndarray, t: int) -> jnp.ndarray:
    """(bq, bq+t) lane-aligned matrix (col 0 never read) -> (bq, t) with
    out[a, j] = g[a, bq - a + j], via static rolls (Mosaic-friendly).

    The per-row left-rotation amount is bq - a <= bq, so only the bits of
    bq participate: ceil(log2(bq))+1 roll+where passes TOTAL for the whole
    q-block row — this is the entire shear cost of one q-block (the r4
    rewrite that replaced the per-(q, k)-pair shear; NOTES "flash shear
    hoist")."""
    bq, w2 = g.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, w2), 0)
    rot = bq - rows                                # in [1, bq], never wraps
    x = g
    shift = 1
    while shift <= bq:
        rolled = pltpu.roll(x, w2 - shift, 1)      # left-rotate by `shift`
        x = jnp.where((rot & shift) > 0, rolled, x)
        shift *= 2
    return x[:, :t]


def _band_scatter_row_rolls(ds: jnp.ndarray, w2: int) -> jnp.ndarray:
    """Inverse of _band_extract_row_rolls: (bq, t) band grads -> (bq, w2)
    with out[a, bq - a + j] = ds[a, j] (zeros elsewhere).

    Right-rotating row a by rot_a = bq - a <= bq undoes the extract's left
    rotation (same bounded log2(bq) pass count); the zero-padded columns
    [t:] land on the never-read positions (incl. the junk column 0), so no
    explicit masking is needed."""
    bq, t = ds.shape
    x = jnp.pad(ds, ((0, 0), (0, w2 - t)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, w2), 0)
    rot = bq - rows                                # right-rotate amount
    shift = 1
    while shift <= bq:
        rolled = pltpu.roll(x, shift, 1)           # right-rotate by `shift`
        x = jnp.where((rot & shift) > 0, rolled, x)
        shift *= 2
    return x


def _scores_row(qu, qv, k_full, p_win, maskf, scale):
    """Masked (bq, T) scores for one q-block against ALL keys — shared by
    the forward and backward kernels. Three big MXU matmuls + ONE shear:
    the (bq, T) row lives only in VMEM registers, never HBM."""
    t = k_full.shape[0]
    ac = jnp.dot(qu, k_full.T, preferred_element_type=jnp.float32)
    g = jnp.dot(qv, p_win.T, preferred_element_type=jnp.float32)
    bd = _band_extract_row_rolls(g, t)
    s = (ac + bd) * scale
    return jnp.where(maskf > 0, s, NEG_INF)


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

    qu/qv: (1, bq, dk); k/v: (1, T, dk); p: (1, 2T, dk) junk-padded;
    mask: (1, 1, T). The whole key axis is processed at once: the (bq, T)
    score row fits VMEM at every supported T (128 x 2400 f32 = 1.2 MB),
    softmax is a plain row reduction, and the XL band shear runs ONCE per
    q-block (log2(bq)+1 bounded rolls) instead of once per (q, k) block
    pair — the per-pair online-softmax k-loop this replaced spent ~75% of
    its time in shear lane shuffles (NOTES "flash shear hoist").
    Also emits the per-row log-sum-exp (the backward pass's softmax state).
    dropout_rate > 0 drops attention PROBABILITIES (the normalizer is
    computed from the undropped terms, matching dense softmax->dropout
    order); masks come from the in-kernel PRNG seeded per (bh, q-block).
    """
    _, bq, dk = qu_ref.shape
    t = k_ref.shape[1]
    qi = pl.program_id(1) * bq
    if dropout_rate > 0.0:
        # single-argument seed (this Mosaic rejects varargs prng_seed):
        # mix (user seed, bh program, q-block) with distinct odd constants
        pltpu.prng_seed(seed_ref[0] * 1000003
                        + pl.program_id(0) * 7919 + pl.program_id(1))

    qu = qu_ref[0, :, :]
    qv = qv_ref[0, :, :]
    k_full = k_ref[0, :, :]
    v_full = v_ref[0, :, :]
    mask_row = mask_ref[0, 0, :]

    # p_ref is the +1-junk-row padded table: window rows [s0, s0 + bq + T)
    # cover original rows [s0 - 1, s0 + bq + T - 1); column 0 of the G
    # matrix is never read (the shear reads offsets bq - a + j >= 1).
    # multiple_of: every term is a block multiple, but Mosaic's alignment
    # prover gives up on the program_id product under bf16 tiling.
    s0 = pl.multiple_of(t - qi - bq, block_k)
    p_win = p_ref[0, pl.ds(s0, bq + t), :]
    s = _scores_row(qu, qv, k_full, p_win, mask_row[None, :], scale)

    m = jnp.max(s, axis=1)
    pexp = jnp.exp(s - m[:, None])
    l = jnp.sum(pexp, axis=1)
    pexp_v = (pexp * _keep_mask((bq, t), dropout_rate)
              if dropout_rate > 0.0 else pexp)
    acc = jnp.dot(pexp_v, v_full, preferred_element_type=jnp.float32)
    o_ref[0, :, :] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)
    # rows with no valid key keep m = NEG_INF, so lse stays ~NEG_INF with
    # no boolean select (Mosaic: no 1-D i1 minor-dim inserts)
    lse_ref[0, 0, :] = m + jnp.log(jnp.maximum(l, 1e-20))


def _bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref,
                lse_ref, o_ref, do_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref,
                *, block_q: int, block_k: int, scale: float,
                dropout_rate: float):
    """One batch*head program: the FULL flash backward, O(T) memory in HBM.

    Recomputes each q-block's (bq, T) score row from the forward's saved
    log-sum-exp (P = exp(S - lse)), then
        dS = P o (dO V^T - D),  D = rowsum(dO o O)
        dQu = dS K,  dK += dS^T Qu,  dV += P^T dO        (all * scale where due)
        dQv = scatter(dS) P_win,  dP[window] += scatter(dS)^T Qv
    where scatter() is the inverse band shear, run ONCE per q-block over
    the whole (bq, T) row (bounded log2(bq)+1 rolls) — like the forward,
    this replaced a per-(q, k)-pair k-loop whose per-pair shears dominated.
    dK/dV/dP accumulate across q-blocks in VMEM; nothing quadratic is ever
    materialized in HBM."""
    t = qu_ref.shape[1]
    n_qb = t // block_q
    bq = block_q

    dk_ref[0, :, :] = jnp.zeros_like(dk_ref[0, :, :])
    dv_ref[0, :, :] = jnp.zeros_like(dv_ref[0, :, :])
    dp_ref[0, :, :] = jnp.zeros_like(dp_ref[0, :, :])

    k_full = k_ref[0, :, :]
    v_full = v_ref[0, :, :]
    mask_row = mask_ref[0, 0, :]

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
            # mixing, same single full-row mask
            pltpu.prng_seed(seed_ref[0] * 1000003
                            + pl.program_id(0) * 7919 + qb)

        # multiple_of: see the forward kernel's note on the band offset
        s0 = pl.multiple_of(t - qi - bq, block_k)
        p_win = p_ref[0, pl.ds(s0, bq + t), :]
        s = _scores_row(qu, qv, k_full, p_win, mask_row[None, :], scale)

        # broadcast lse to 2-D BEFORE any boolean op (Mosaic cannot
        # minor-dim-insert 1-D i1 vectors); fully-masked rows get p_row = 0
        lse2 = jax.lax.broadcast_in_dim(lse, s.shape, (0,))
        valid2 = lse2 > NEG_INF / 2
        p_row = jnp.where(valid2, jnp.exp(s - jnp.where(valid2, lse2, 0.0)),
                          0.0)
        dp_full = jnp.dot(do_blk, v_full.T.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(p_row.shape, dropout_rate)
            p_drop = p_row * keep        # P-tilde, as applied in fwd
            dp_full = dp_full * keep     # cotangent through the mask
        else:
            p_drop = p_row
        ds_s = p_row * (dp_full - dvec[:, None]) * scale

        dqu_ref[0, pl.ds(qi, block_q), :] = jnp.dot(
            ds_s, k_full.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        dk_ref[0, :, :] += jnp.dot(ds_s.T, qu.astype(jnp.float32),
                                   preferred_element_type=jnp.float32)
        dv_ref[0, :, :] += jnp.dot(p_drop.T, do_blk,
                                   preferred_element_type=jnp.float32)

        dg = _band_scatter_row_rolls(ds_s, bq + t)
        dqv_ref[0, pl.ds(qi, block_q), :] = jnp.dot(
            dg, p_win.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        dp_ref[0, pl.ds(s0, bq + t), :] += jnp.dot(
            dg.T, qv.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_qb, q_body, 0)


def xla_rel_shift(x):
    """(..., T, 2T-1) -> (..., T, T) with out[..., i, j] = x[..., i, T-1-i+j]
    — the XL band shear as pure XLA pad/reshape/slice (autodiff-exact)."""
    *lead, t, _ = x.shape
    lead_pad = [(0, 0)] * len(lead)
    x = jnp.pad(x, lead_pad + [(0, 0), (1, 0)])
    x = x.reshape(*lead, 2 * t, t)[..., 1:, :]
    x = x.reshape(*lead, t, 2 * t - 1)
    return x[..., :t]


def dense_rel_attention(q_u, q_v, k, v, p, mask):
    """Dense reference math (the exact non-flash conformer path): used as
    the interpret-mode oracle and as the recompute function in the VJP."""
    b, h, t, dk = q_u.shape
    scale = 1.0 / np.sqrt(dk)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, p)
    # generalized rel_shift: bd[..., i, j] wants table row (T-1) - i + j
    bd = xla_rel_shift(bd)
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
        # the full-row program holds a few (bq, T+bq) f32 tiles at once; at
        # T≈2400 that brushes Mosaic's default 16 MiB scoped budget with
        # double buffering, so raise it toward the chip's physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
# bias-flash implementation (experimental, NOT default — measured slower).
#
# Motivation: the r4 stage-1 attribution (scripts/profile_conformer.py)
# showed the shear kernels run at ~3 TF/s at the training shapes (b6 h8
# T1200 dk64): per (q, k) block pair the in-kernel shear costs 8 roll+where
# passes over a (bq, bq+bk) tile forward (plus the scatter in backward) —
# VPU lane shuffles that dwarf the tiny MXU matmuls.
#
# This variant precomputes the position score OUTSIDE the kernel:
#     bias = xla_rel_shift(q_v @ p^T) * scale          # (B, H, T, T), f32
# and the kernels consume bias TILES as a plain additive input — no shear,
# no q_v/p in Mosaic at all.
#
# MEASURED on v5e (scripts/profile_flash_bias.py, b6 h8 T1200 dk64 f32,
# relay floor subtracted): the bias KERNELS are indeed fast (fwd 3.76 ms,
# fwd+bwd 6.78 vs shear's 5.3 / 14.38) but XLA's lowering of
# xla_rel_shift on the (B, H, T, 2T-1) tensor costs 11.59 ms alone —
# ~3.5x over its ~3.3 ms bandwidth floor (the sublane-misaligned
# reshape/slice lowers to shuffle loops, the very cost this impl was built
# to remove) — plus einsum 1.84 + tile-transpose 2.64. End to end: fwd
# 15.75 vs 5.3, fwd+bwd 28.5 vs 14.38. Even at the bandwidth floor the
# construction+traffic (~8 ms fwd) would not beat the shear kernel, so
# "shear" stays the default; this impl is kept (tested, env-selectable via
# LIP2SPEECH_FLASH_IMPL=bias) as the measured record of the attempt and as
# the starting point if a cheap shear lowering ever lands in XLA.
# ---------------------------------------------------------------------------


def _bias_kernel(seed_ref, qu_ref, k_ref, v_ref, bias_ref, mask_ref,
                 o_ref, lse_ref, *, block_k: int, scale: float,
                 dropout_rate: float):
    """One (batch*head, q-block) program; bias: (1, n_kb, bq, bk) f32
    pre-sheared AND pre-tiled — the k-loop indexes the LEADING dim (a plain
    address offset). A (bq, T) layout sliced per k-block was measured 3x
    slower end to end: Mosaic lowers lane-dim dynamic slices to lane
    shuffles, re-creating the shear cost this impl exists to remove.
    Online softmax identical to _kernel; only the score tile differs."""
    _, bq, dk = qu_ref.shape
    t = k_ref.shape[1]
    n_kb = t // block_k
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] * 1000003
                        + pl.program_id(0) * 7919 + pl.program_id(1))

    qu = qu_ref[0, :, :]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kj = pl.multiple_of(kb * block_k, block_k)
        k_blk = k_ref[0, pl.ds(kj, block_k), :]
        v_blk = v_ref[0, pl.ds(kj, block_k), :]
        mask_blk = mask_ref[0, 0, pl.ds(kj, block_k)]
        b_blk = bias_ref[0, kb, :, :]
        ac = jnp.dot(qu, k_blk.T, preferred_element_type=jnp.float32)
        s = jnp.where(mask_blk[None, :] > 0, ac * scale + b_blk, NEG_INF)

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
    lse_ref[0, 0, :] = m + jnp.log(jnp.maximum(l, 1e-20))


def _bias_bwd_kernel(seed_ref, qu_ref, k_ref, v_ref, bias_ref, mask_ref,
                     lse_ref, o_ref, do_ref,
                     dqu_ref, dk_ref, dv_ref, dbias_ref,
                     *, block_q: int, block_k: int, scale: float,
                     dropout_rate: float):
    """One batch*head program: flash backward with precomputed bias.

    s = AC*scale + bias, so dS splits: dbias tile = dS (written once per
    (q, k) pair — every pair is visited, no init needed), dQu/dK take the
    extra *scale. No scatter shear: the bias path's q_v/p gradients run
    through XLA autodiff of (einsum + xla_rel_shift) outside the kernel.
    bias/dbias use the (1, n_kb, T, bk) tiled layout (see _bias_kernel)."""
    t = qu_ref.shape[1]
    n_qb = t // block_q
    n_kb = t // block_k

    dk_ref[0, :, :] = jnp.zeros_like(dk_ref[0, :, :])
    dv_ref[0, :, :] = jnp.zeros_like(dv_ref[0, :, :])

    def q_body(qb, _):
        qi = pl.multiple_of(qb * block_q, block_q)
        qu = qu_ref[0, pl.ds(qi, block_q), :]
        do_blk = do_ref[0, pl.ds(qi, block_q), :].astype(jnp.float32)
        o_blk = o_ref[0, pl.ds(qi, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi, block_q)]
        dvec = jnp.sum(do_blk * o_blk, axis=1)
        if dropout_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] * 1000003
                            + pl.program_id(0) * 7919 + qb)

        def k_body(kb, dqu_acc):
            kj = pl.multiple_of(kb * block_k, block_k)
            k_blk = k_ref[0, pl.ds(kj, block_k), :]
            v_blk = v_ref[0, pl.ds(kj, block_k), :]
            mask_blk = mask_ref[0, 0, pl.ds(kj, block_k)]
            b_blk = bias_ref[0, kb, pl.ds(qi, block_q), :]
            ac = jnp.dot(qu, k_blk.T, preferred_element_type=jnp.float32)
            s = jnp.where(mask_blk[None, :] > 0, ac * scale + b_blk, NEG_INF)

            lse2 = jax.lax.broadcast_in_dim(lse, s.shape, (0,))
            valid2 = lse2 > NEG_INF / 2
            p_row = jnp.where(valid2, jnp.exp(s - jnp.where(valid2, lse2,
                                                            0.0)), 0.0)
            dp_blk = jnp.dot(do_blk, v_blk.T.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                keep = _keep_mask(p_row.shape, dropout_rate)
                p_drop = p_row * keep
                dp_blk = dp_blk * keep
            else:
                p_drop = p_row
            ds = p_row * (dp_blk - dvec[:, None])
            dbias_ref[0, kb, pl.ds(qi, block_q), :] = ds
            dsa = ds * scale
            dqu_acc = dqu_acc + jnp.dot(dsa, k_blk.astype(jnp.float32),
                                        preferred_element_type=jnp.float32)
            dk_ref[0, pl.ds(kj, block_k), :] += jnp.dot(
                dsa.T, qu.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            dv_ref[0, pl.ds(kj, block_k), :] += jnp.dot(
                p_drop.T, do_blk, preferred_element_type=jnp.float32)
            return dqu_acc

        z = jnp.zeros((block_q, qu_ref.shape[2]), jnp.float32)
        dqu_ref[0, pl.ds(qi, block_q), :] = jax.lax.fori_loop(
            0, n_kb, k_body, z)
        return 0

    jax.lax.fori_loop(0, n_qb, q_body, 0)


def _dense_bias_attention_flat(qu, k, v, bias, maskf):
    """Dense oracle on the FLAT padded layout (z=b*h): the bias-kernel math
    without Pallas — the VJP recompute path for bwd='dense'."""
    dk = qu.shape[-1]
    scale = 1.0 / np.sqrt(dk)
    s = jnp.einsum("ztd,zsd->zts", qu, k) * scale + bias
    m = maskf > 0                                   # (z, 1, T) key mask
    s = jnp.where(m, s, NEG_INF)
    attn = jax.nn.softmax(s, axis=-1)
    attn = jnp.where(m, attn, 0.0)
    return jnp.einsum("zts,zsd->ztd", attn, v)


@functools.partial(jax.jit, static_argnames=("blk", "interpret",
                                             "return_lse", "dropout_rate"))
def _flash_bias_impl(qu, k, v, bias, maskf, seed, blk: int = 128,
                     interpret: bool = False, return_lse: bool = False,
                     dropout_rate: float = 0.0):
    """qu/k/v: (z, T, dk) flat padded; bias: (z, T, T) f32; maskf: (z, 1, T)."""
    if dropout_rate > 0.0 and interpret:
        raise NotImplementedError(
            "in-kernel attention dropout needs the TPU PRNG (interpret-mode "
            "prng_random_bits is stubbed); use the dense path off-TPU")
    z, t_pad, dk = qu.shape
    scale = 1.0 / np.sqrt(dk)
    n_kb = t_pad // blk
    # tile the key axis into the leading dim: in-kernel k-loop slicing of a
    # (bq, T) tile on the LANE dim costs Mosaic lane shuffles (measured 3x)
    bias_t = bias.reshape(z, t_pad, n_kb, blk).transpose(0, 2, 1, 3)
    grid = (z, t_pad // blk)
    out, lse = pl.pallas_call(
        functools.partial(_bias_kernel, block_k=blk, scale=scale,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kb, blk, blk), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z, t_pad, dk), qu.dtype),
            jax.ShapeDtypeStruct((z, 1, t_pad), jnp.float32),
        ],
        interpret=interpret,
    )(seed.astype(jnp.int32), qu, k, v, bias_t, maskf)
    if return_lse:
        return out, lse
    return out


@functools.partial(jax.jit, static_argnames=("blk", "interpret",
                                             "dropout_rate"))
def _flash_bias_bwd_impl(qu, k, v, bias, maskf, lse, out, g,
                         blk: int = 128, interpret: bool = False,
                         dropout_rate: float = 0.0, seed=None):
    z, t_pad, dk = qu.shape
    scale = 1.0 / np.sqrt(dk)
    n_kb = t_pad // blk
    bias_t = bias.reshape(z, t_pad, n_kb, blk).transpose(0, 2, 1, 3)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    full = lambda i: (i, 0, 0)          # noqa: E731
    spec3 = pl.BlockSpec((1, t_pad, dk), full, memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, n_kb, t_pad, blk), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dqu, dkk, dvv, dbias = pl.pallas_call(
        functools.partial(_bias_bwd_kernel, block_q=blk, block_k=blk,
                          scale=scale, dropout_rate=dropout_rate),
        grid=(z,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec3, spec3, spec3, spec_b,
            pl.BlockSpec((1, 1, t_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), full, memory_space=pltpu.VMEM),
            spec3, spec3,
        ],
        out_specs=[spec3, spec3, spec3, spec_b],
        out_shape=[
            jax.ShapeDtypeStruct((z, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((z, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((z, t_pad, dk), jnp.float32),
            jax.ShapeDtypeStruct((z, n_kb, t_pad, blk), jnp.float32),
        ],
        # per-program VMEM: the (T, T) bias + dbias tiles alone are ~13 MB
        # f32 at T=1280 — over Mosaic's default 16 MiB scoped budget
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed.astype(jnp.int32), qu, k, v, bias_t, maskf, lse, out, g)
    dbias = dbias.transpose(0, 2, 1, 3).reshape(z, t_pad, t_pad)
    return dqu, dkk, dvv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_bias(blk, interpret, bwd, dropout_rate,
                qu, k, v, bias, maskf, seed):
    return _flash_bias_impl(qu, k, v, bias, maskf, seed, blk=blk,
                            interpret=interpret, dropout_rate=dropout_rate)


def _flash_bias_fwd(blk, interpret, bwd, dropout_rate,
                    qu, k, v, bias, maskf, seed):
    out, lse = _flash_bias_impl(qu, k, v, bias, maskf, seed, blk=blk,
                                interpret=interpret, return_lse=True,
                                dropout_rate=dropout_rate)
    return out, (qu, k, v, bias, maskf, lse, out, seed)


def _flash_bias_bwd(blk, interpret, bwd, dropout_rate, residuals, g):
    qu, k, v, bias, maskf, lse, out, seed = residuals
    if bwd == "kernel" or dropout_rate > 0.0:
        dqu, dk_, dv_, dbias = _flash_bias_bwd_impl(
            qu, k, v, bias, maskf, lse, out, g, blk=blk,
            interpret=interpret, dropout_rate=dropout_rate, seed=seed)
        dqu = dqu.astype(qu.dtype)
        dk_ = dk_.astype(k.dtype)
        dv_ = dv_.astype(v.dtype)
        dbias = dbias.astype(bias.dtype)
    else:
        _, vjp = jax.vjp(
            lambda a, b, c, d: _dense_bias_attention_flat(a, b, c, d, maskf),
            qu, k, v, bias)
        dqu, dk_, dv_, dbias = vjp(g)
    dmaskf = np.zeros(maskf.shape, dtype=jax.dtypes.float0)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dqu, dk_, dv_, dbias, dmaskf, dseed


_flash_bias.defvjp(_flash_bias_fwd, _flash_bias_bwd)


def _rel_flash_bias(block, interpret, bwd, dropout_rate,
                    q_u, q_v, k, v, p, mask, seed):
    """Bias-impl entry: pad, build the sheared position bias in XLA, run
    the bias kernels. q_v/p gradients flow through plain autodiff of the
    einsum + xla_rel_shift composition (the custom VJP covers only the
    kernel call)."""
    b, h, t, dk = q_u.shape
    scale = 1.0 / np.sqrt(dk)
    qu, qv, kf, vf, pp, maskf, blk, t_pad = _pad_inputs(
        q_u, q_v, k, v, p, mask, block)
    # pp is the +1-junk-row padded table; rows [1:] are the re-centered
    # (2*t_pad - 1) original table
    g = jnp.einsum("bhtd,hsd->bhts", qv.reshape(b, h, t_pad, dk),
                   pp[:, 1:, :], preferred_element_type=jnp.float32)
    bias = (xla_rel_shift(g) * scale).reshape(b * h, t_pad, t_pad)
    out = _flash_bias(blk, interpret, bwd, dropout_rate,
                      qu, kf, vf, bias, maskf, seed)
    return out.reshape(b, h, t_pad, dk)[:, :, :t, :]


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

# kernel implementation: "shear" (default — O(T)-memory kernels with the
# in-kernel roll shear) or "bias" (position bias precomputed in XLA; built
# to kill the in-kernel shuffles but measured SLOWER end to end because
# XLA's rel-shift lowering is worse — see the bias-flash section)
_IMPL_DEFAULT = os.environ.get("LIP2SPEECH_FLASH_IMPL", "shear")


def _impl_fn(impl: str):
    if impl not in ("bias", "shear"):
        raise ValueError(f"unknown flash impl {impl!r} (bias|shear)")
    return _rel_flash_bias if impl == "bias" else _rel_flash


def set_flash_mesh(mesh) -> None:
    """Declare the mesh whose jitted programs will contain this kernel
    (None clears it). Axes must be named 'data' / 'model' (parallel/mesh)."""
    global _FLASH_MESH
    _FLASH_MESH = mesh


def _shard_mapped_flash(mesh, block, interpret, bwd, dropout_rate, impl,
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
        return _impl_fn(impl)(block, interpret, bwd, dropout_rate,
                              q_u, q_v, k, v, p, mask, seed)

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(qspec, qspec, qspec, qspec, pspec, mspec, P(None)),
        out_specs=qspec, check_vma=False)(q_u, q_v, k, v, p, mask, seed)


def rel_flash_attention(q_u, q_v, k, v, p, mask,
                        block: int = 128, interpret: bool = False,
                        bwd: str = "kernel", dropout_rate: float = 0.0,
                        dropout_seed=None, impl: str | None = None):
    """Flash rel-attention, differentiable. Forward: Pallas online-softmax
    kernel (O(T) memory, saves only out + log-sum-exp). Backward:
    bwd="kernel" (default) runs the fused flash backward kernel
    (_bwd_kernel) — nothing quadratic ever hits HBM; bwd="dense" falls back
    to dense recompute of the probabilities inside the VJP.

    dropout_rate > 0 applies attention-probability dropout INSIDE the
    kernels via the TPU PRNG (the reference recipe's attention_dropout);
    masks are regenerated identically in the backward from dropout_seed
    (an int32 scalar/1-vector). TPU-only (interpret-mode PRNG is stubbed).

    impl selects the kernel family (default env LIP2SPEECH_FLASH_IMPL or
    "bias"): "bias" precomputes the XL position bias in XLA and keeps the
    Mosaic kernels shear-free (fastest at training shapes, O(T^2) bias in
    HBM); "shear" is the original fully-O(T) in-kernel band-shear pair."""
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
    impl = impl or _IMPL_DEFAULT
    if (_FLASH_MESH is not None and _FLASH_MESH.size > 1
            and not jax.sharding.get_abstract_mesh().manual_axes):
        # already-manual traces (a caller's own shard_map) skip the wrap —
        # nesting shard_map inside shard_map is illegal
        return _shard_mapped_flash(_FLASH_MESH, block, interpret, bwd,
                                   dropout_rate, impl,
                                   q_u, q_v, k, v, p, mask, seed)
    return _impl_fn(impl)(block, interpret, bwd, dropout_rate,
                          q_u, q_v, k, v, p, mask, seed)
