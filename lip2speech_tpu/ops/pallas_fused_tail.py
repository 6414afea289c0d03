"""Fused HiFi-GAN resblock-trio Pallas kernel (the vocoder tail, in VMEM).

Reference semantics: speech-resynthesis/models.py:16-114 — after each
upsample, the generator runs THREE ResBlock1 modules (kernel 3/7/11, each
with dilation branches 1/3/5 of [lrelu -> dilated conv -> lrelu -> conv ->
residual add]) and averages them. That is 18 convs + ~21 elementwise passes
over the same activation per stage; at the 16-64-channel tail every XLA op
is a full HBM round trip, and the r3 profile (NOTES.md) measured the three
tail trios at 5.3/4.4/3.6 ms — 3-5x above their compute bound — AFTER the
folded-layout fix removed the 8x lane-padding traffic.

This kernel runs the WHOLE trio per grid tile inside VMEM: one HBM read of
the input tile (with halo), 60-150 static (rows, 128)@(128, 128) MXU
matmuls, one HBM write of the averaged output. Convs use the exact G-block
form of ops/fold_conv.py (y_folded = sum_g row_shift_g(x_folded) @ Wg) with
one improvement: shift blocks whose weight matrix is entirely zero (fold <
dilation leaves gaps in the tap-position lattice) are skipped, cutting the
matmul count ~20-40% at fold=1/2.

Exactness: same MACs as the XLA folded path (plus zeros), f32 accumulation,
bias added after the cast to the activation dtype — mirroring
fold_conv1d_gblock so the two paths agree to accumulation order.

Differentiable: jax.custom_vjp whose backward recomputes through the XLA
reference implementation (`trio_xla`, also the parity oracle in
tests/test_fused_tail.py) — the fused forward is inference-speed, training
gradients are the already-tested XLA ones.

Runs compiled on TPU; interpret mode elsewhere (CPU tests).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lip2speech_tpu.ops import nn as ops
from lip2speech_tpu.ops.fold_conv import (branch_paddings,  # noqa: F401 (re-export)
                                          fold_conv1d_gblock, gblock_placement)

LRELU_SLOPE = 0.1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class _ConvGeom:
    """Static geometry of one conv inside the kernel."""

    offsets: tuple[int, ...]  # absolute row shifts (one per nonzero block)
    goff: int                 # first row of this conv's blocks in wg_all
    bias_idx: int             # row of the folded bias in bias_all


def _sparse_gblock_weights(w: jnp.ndarray, pad: int, dilation: int,
                           fold: int) -> tuple[jnp.ndarray, list[int]]:
    """(K, C, Co) -> ((n_occ, fold*C, fold*Co) blocks, absolute row offsets).

    Shares fold_conv.gblock_placement (THE tap lattice — fused and XLA
    paths cannot drift) restricted to occupied blocks, contracted as ONE
    einsum: w is a traced param, so a scatter-style build would put ~K*fold
    tiny dynamic-update-slices PER CONV into the serving graph.
    """
    K, C, Co = w.shape
    P, offs = gblock_placement(K, dilation, pad, fold, sparse=True)
    Wg = jnp.einsum("gufj,jio->guifo", jnp.asarray(P, w.dtype), w)
    return Wg.reshape(len(offs), fold * C, fold * Co), offs


def trio_xla(xf: jnp.ndarray, weights, fold: int,
             kernel_sizes: Sequence[int],
             dilation_sizes: Sequence[Sequence[int]]) -> jnp.ndarray:
    """Reference XLA implementation on the folded layout (exact semantics of
    the ResBlock1 loop in models/vocoder.py). weights: per resblock, per
    dilation branch, ((w1, b1), (w2, b2)) raw conv params (K, C, C)/(C,)."""
    acc = None
    for rb, (k, dils) in zip(weights, zip(kernel_sizes, dilation_sizes)):
        xb = xf
        for ((w1, b1), (w2, b2)), d in zip(rb, dils):
            pad1, pad2 = branch_paddings(k, d)
            xt = ops.leaky_relu(xb, LRELU_SLOPE)
            xt = fold_conv1d_gblock(xt, w1, b1, pad1, d, fold)
            xt = ops.leaky_relu(xt, LRELU_SLOPE)
            xt = fold_conv1d_gblock(xt, w2, b2, pad2, 1, fold)
            xb = xb + xt
        acc = xb if acc is None else acc + xb
    return acc / len(weights)


def _build_tables(weights, fold, kernel_sizes, dilation_sizes, dtype):
    """Stack every conv's sparse G-blocks + folded biases; return the static
    per-conv geometry, chain halo H, and guard band S."""
    wg_parts, bias_rows, geoms = [], [], []
    goff = 0
    halos = []
    max_margin = 0
    for rb, (k, dils) in zip(weights, zip(kernel_sizes, dilation_sizes)):
        chain = 0
        rb_geoms = []
        for ((w1, b1), (w2, b2)), d in zip(rb, dils):
            pad1, pad2 = branch_paddings(k, d)
            for w, b, pad, dil in ((w1, b1, pad1, d), (w2, b2, pad2, 1)):
                Wg, offs = _sparse_gblock_weights(w.astype(dtype), pad, dil, fold)
                m = max(-min(offs), max(offs))
                chain += m
                max_margin = max(max_margin, m)
                rb_geoms.append(_ConvGeom(tuple(offs), goff, len(bias_rows)))
                goff += len(offs)
                wg_parts.append(Wg)
                bias_rows.append(jnp.tile(b, fold).astype(dtype))
        halos.append(chain)
        geoms.append(rb_geoms)
    wg_all = jnp.concatenate(wg_parts, axis=0)
    bias_all = jnp.stack(bias_rows, axis=0)
    # halo rounded up to a multiple of 4 so the DMA slice length
    # MT2 = MT + 2H stays 8-row-aligned (Mosaic rejects unaligned memref
    # slices: "Slice shape along dimension 1 must be aligned to tiling (8)");
    # extra halo rows are inert — the padded input provides them and the
    # in-sequence mask zeroes anything outside the true rows
    H = _round_up(max(halos), 4)
    S = max(16, _round_up(max_margin, 16))
    return wg_all, bias_all, geoms, H, S


def _fused_forward(xf, weights, fold, kernel_sizes, dilation_sizes,
                   interpret, block_rows):
    B, M, L = xf.shape
    dtype = xf.dtype
    n_res = len(weights)
    wg_all, bias_all, geoms, H, S = _build_tables(
        weights, fold, kernel_sizes, dilation_sizes, dtype)

    # Cap the tile so the kernel's scoped-VMEM stack fits: the unrolled
    # trio keeps ~32 (BUF, L) temporaries live (measured on v5e: a 19.0M
    # stack at BUF=1176 f32 rows, vs Mosaic's 16M scoped limit -> VMEM OOM
    # at the default 1024-row block). Budget 8M leaves 2x headroom for
    # scheduling variance across geometries.
    _stack_budget = 8 * 2 ** 20
    _per_row = L * jnp.dtype(dtype).itemsize
    _max_buf = _stack_budget // (32 * _per_row)
    _mt_cap = max(8, (_max_buf - 2 * H - 2 * S) // 8 * 8)
    MT = min(block_rows, _round_up(M, 8), _mt_cap)
    n_tiles = -(-M // MT)
    Mc = n_tiles * MT
    MT2 = MT + 2 * H
    BUF = MT2 + 2 * S

    # pad rows: H halo each side + round M up to a tile multiple (zeros =
    # zero samples, exactly the conv's own boundary condition)
    xp = jnp.pad(xf, ((0, 0), (H, H + (Mc - M)), (0, 0)))

    def kernel(x_hbm, wg_ref, b_ref, o_ref, xin, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        # Rows of the buffer that lie OUTSIDE the true sequence [0, M) must
        # stay zero after every conv (each conv zero-pads its own input at
        # the sequence ends; without the mask the bias/edge taps would
        # fabricate a "virtual extension" that leaks into the next conv).
        # Buffer row r holds padded-input row ti*MT + r - S; true sequence
        # rows are padded rows [H, H + M).
        xprow = (jax.lax.broadcasted_iota(jnp.int32, (BUF, 1), 0)
                 + ti * MT - S)
        in_seq = (xprow >= H) & (xprow < H + M)

        def conv(x_val, geom: _ConvGeom):
            accm = None
            for i, off in enumerate(geom.offsets):
                sh = jax.lax.slice_in_dim(x_val, S + off, S + off + MT2,
                                          axis=0)
                t = jnp.dot(sh, wg_ref[geom.goff + i],
                            preferred_element_type=jnp.float32)
                accm = t if accm is None else accm + t
            y = accm.astype(dtype) + b_ref[geom.bias_idx:geom.bias_idx + 1, :]
            zeros = jnp.zeros((S, L), dtype)
            y = jnp.concatenate([zeros, y, zeros], axis=0)
            return jnp.where(in_seq, y, jnp.zeros((), dtype))
        xin[0:S, :] = jnp.zeros((S, L), dtype)
        xin[S + MT2:, :] = jnp.zeros((S, L), dtype)
        # MT is a multiple of 8 by construction — tell Mosaic (dynamic DMA
        # offsets without provable alignment have failed to compile before:
        # NOTES r3, flash band-table offsets)
        row0 = pl.multiple_of(ti * MT, 8)
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(row0, MT2), :],
            xin.at[pl.ds(S, MT2), :], sem)
        dma.start()
        dma.wait()
        def lrelu(v):
            # NOT ops.leaky_relu: its where(x >= 0, ...) emits a bf16
            # vector cmpf that v5e Mosaic rejects ("Target does not support
            # this comparison" on vector<8x128x2xbf16>). max(x, s*x) is the
            # same function for 0 < s < 1 (bit-exact: s*x is computed
            # identically on the negative branch, and rounding cannot cross
            # x) and lowers to a native VPU max with no predicate. Gradient
            # ties at 0 don't matter here — the custom_vjp backward runs
            # through trio_xla, never this kernel.
            return jnp.maximum(v, LRELU_SLOPE * v)

        x = xin[:]
        acc = None
        for rb_geoms in geoms:
            xb = x
            for br in range(len(rb_geoms) // 2):
                xt = lrelu(xb)
                xt = conv(xt, rb_geoms[2 * br])
                xt = lrelu(xt)
                xt = conv(xt, rb_geoms[2 * br + 1])
                xb = xb + xt
            acc = xb if acc is None else acc + xb
        out = acc / n_res  # divide (not mul-by-inverse): matches trio_xla
        o_ref[0, :, :] = jax.lax.slice_in_dim(out, S + H, S + H + MT, axis=0)

    y = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, MT, L), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mc, L), dtype),
        scratch_shapes=[
            pltpu.VMEM((BUF, L), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wg_all, bias_all)
    return y[:, :M, :]


def fused_resblock_trio(xf: jnp.ndarray, weights, fold: int,
                        kernel_sizes: Sequence[int],
                        dilation_sizes: Sequence[Sequence[int]],
                        *, interpret: bool = False,
                        block_rows: int = 1024) -> jnp.ndarray:
    """Mean of the HiFi-GAN resblocks on folded input, fused in VMEM.

    xf: (B, M, fold*C) folded activations, fold*C a multiple of 128.
    weights: per resblock, per dilation branch, ((w1, b1), (w2, b2)) with w
    of shape (K, C, C). Forward runs the Pallas kernel; gradients recompute
    through the XLA reference path (same math, already test-pinned).
    """
    L = xf.shape[-1]
    assert L % 128 == 0, f"fused tail needs 128-multiple lanes, got {L}"
    # the kernel promises Mosaic 8-row-aligned DMA offsets (ti * MT)
    block_rows = _round_up(block_rows, 8)
    ks = tuple(kernel_sizes)
    ds_ = tuple(tuple(d) for d in dilation_sizes)

    @jax.custom_vjp
    def run(xf, weights):
        return _fused_forward(xf, weights, fold, ks, ds_, interpret,
                              block_rows)

    def run_fwd(xf, weights):
        return run(xf, weights), (xf, weights)

    def run_bwd(res, g):
        xf, weights = res
        _, vjp = jax.vjp(lambda x, w: trio_xla(x, w, fold, ks, ds_),
                         xf, weights)
        return vjp(g.astype(xf.dtype))

    run.defvjp(run_fwd, run_bwd)
    if (_TAIL_MESH is not None and _TAIL_MESH.size > 1
            and not jax.sharding.get_abstract_mesh().manual_axes):
        # GSPMD cannot partition a Mosaic custom call (jax
        # tpu_custom_call.py raises NotImplementedError), so inside a
        # multi-device jitted program — train_stage2 --fused-gen on a dp
        # mesh — the kernel self-wraps in shard_map: batch over 'data',
        # weight tables replicated. Skipped when the trace is already
        # manual (the serving pipeline's own top-level shard_map).
        from jax.sharding import PartitionSpec as P

        from lip2speech_tpu.parallel.mesh import DATA_AXIS

        nd = _TAIL_MESH.shape.get(DATA_AXIS, 1)
        bax = DATA_AXIS if (nd > 1 and xf.shape[0] % nd == 0) else None
        spec = P(bax, None, None)
        return jax.shard_map(run, mesh=_TAIL_MESH, in_specs=(spec, P()),
                             out_specs=spec, check_vma=False)(xf, weights)
    return run(xf, weights)


_TAIL_MESH = None


def set_fused_tail_mesh(mesh) -> None:
    """Declare the mesh whose jitted programs will contain this kernel
    (None clears it); see fused_resblock_trio. The stage-2 GAN-step builder
    calls this when given a multi-device mesh."""
    global _TAIL_MESH
    _TAIL_MESH = mesh
