"""MXU-shaped reformulation of small-channel 1-D convs (the HiFi-GAN tail).

The vocoder's late stages run 16-64 channels over 10^5-10^6 samples
(speech-resynthesis/models.py:98-114 at 320x upsampling). A direct conv with
C_out=16 uses 16 of the MXU's 128 output lanes — measured ~17.5% MFU for the
vocoder and ~10% for its tail (NOTES r2 §2), which is the binding constraint
on serving RTF.

Trick: compute F consecutive output samples as ONE matmul row block —
"output-time folding". For a stride-1 dilated conv (K taps, dilation d),
the F outputs y[tF..tF+F-1] depend on the contiguous input window
x[tF-P : tF-P + F+(K-1)d]. Materialize those windows as patches
(B, T/F, (F+(K-1)d)*C) and multiply by a sparse-placed weight matrix
((F+(K-1)d)*C, F*C_out): the matmul now has F*C_out >= 128 output lanes.
Useful-MAC fraction k/(F+(K-1)d) trades some redundant FLOPs for 8x lane
occupancy — net win for K*d small vs F (the k=3 convs2 and all transposes),
and bounded loss for k=11,d=5.

ConvTranspose (stride s) decomposes into s polyphase stride-1 correlations
(y[ms+r] = sum_j' w[j's+rho_r] x[m+c_r-j']); all s phases and F folds emit
from one matmul with F*s*C_out lanes.

Everything here is EXACT (pure reindexing of the same MACs + zeros) and pure
XLA. MEASURED RESULT on TPU v5e (batch 4 x 9.6 s clips, bf16): the folded
generator runs 4-6x SLOWER than the direct convs (77 ms -> 476 ms wall)
with BOTH patch constructions tried — fancy-index gather AND width
stride-F slices — because XLA materializes the (width/F)x-duplicated patch
tensor through HBM instead of fusing it into the matmul. The formulation is
kept as a tested, documented experiment (VocoderConfig.mxu_fold, default
OFF; exactness pinned by tests/test_fold_conv.py): realizing the lane-packing
win requires building the patches in VMEM inside a Pallas kernel, and the
arithmetic ceiling of ANY exact lane-packing is k/(F+(k-1)d) useful-MAC
fraction ~ 17-30%, i.e. at most ~2x on the vocoder tail. Full evidence and
the measured breakdown live in NOTES.md (round 3).
"""

from __future__ import annotations

import jax
import numpy as np

import jax.numpy as jnp


def _patches(x: jnp.ndarray, fold: int, width: int, start: int) -> jnp.ndarray:
    """x (B, T, C) -> (B, T/fold, width, C); window for folded step t begins
    at sample t*fold + start (out-of-range reads are zeros).

    Built from `width` stride-`fold` slices (one per window offset), NOT a
    fancy-index gather — TPU lowers strided slices to cheap copies while a
    2-D gather materializes catastrophically (measured 4-7x slower)."""
    b, t, c = x.shape
    assert t % fold == 0, (t, fold)
    pad_l = max(0, -start)
    pad_r = max(0, (t - fold) + start + width - t)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    base = start + pad_l
    cols = [jax.lax.slice_in_dim(xp, base + w, base + w + (t - fold) + 1,
                                 stride=fold, axis=1)
            for w in range(width)]
    return jnp.stack(cols, axis=2)                 # (B, T/fold, width, C)


def fold_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                padding: int, dilation: int, fold: int) -> jnp.ndarray:
    """'Same-length' stride-1 conv1d (torch semantics, T_out == T required)
    with output-time folding. x: (B, T, C); w: (K, C, Co)."""
    B, T, C = x.shape
    K, _, Co = w.shape
    assert T + 2 * padding - (K - 1) * dilation == T, \
        "fold_conv1d requires length-preserving padding"
    width = fold + (K - 1) * dilation
    patches = _patches(x, fold, width, -padding)        # (B, T/F, width, C)

    # W[f + j*d, :, f, :] = w[j]  (offset within the window is f + j*d)
    f_idx, j_idx = np.meshgrid(np.arange(fold), np.arange(K), indexing="ij")
    pos = (f_idx + j_idx * dilation).reshape(-1)
    wmat = jnp.zeros((width, C, fold, Co), w.dtype)
    wmat = wmat.at[pos, :, f_idx.reshape(-1), :].set(
        jnp.broadcast_to(w[j_idx.reshape(-1)], (fold * K, C, Co)))

    y = jnp.einsum("bswc,wcfo->bsfo", patches, wmat,
                   preferred_element_type=jnp.float32)
    y = y.reshape(B, T, Co)
    return y if b is None else y + b


def fold_conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                          b: jnp.ndarray | None, stride: int, padding: int,
                          fold: int) -> jnp.ndarray:
    """ConvTranspose1d (torch layout w: (K, Co, Ci)) with output folding,
    restricted to configs where T_out == stride * T_in (true for all the
    HiFi-GAN stages: (k-1)*stride == k - 2*padding... i.e.
    (T-1)s - 2p + k == Ts  <=>  k == s + 2p)."""
    B, T, C = x.shape
    K, Co, _ = w.shape
    s = stride
    assert K == s + 2 * padding, "fold_conv_transpose1d needs T_out == s*T_in"

    # polyphase: y[m*s + r] = sum_{j'} w[j'*s + rho_r] . x[m + c_r - j']
    phases = []
    for r in range(s):
        rho = (r + padding) % s
        c_r = (r + padding) // s
        js = np.arange(rho, K, s)          # absolute taps of this phase
        phases.append((r, c_r, js))

    offsets = [c_r - j_rel
               for (_, c_r, js) in phases
               for j_rel in range(len(js))]
    omin = min(o for o in offsets)
    omax = (fold - 1) + max(o for o in offsets)
    width = omax - omin + 1
    patches = _patches(x, fold, width, omin)             # (B, T/F, width, C)

    pos_l, col_l, tap_l = [], [], []
    for f in range(fold):
        for (r, c_r, js) in phases:
            for j_rel, j_abs in enumerate(js):
                pos_l.append((f + c_r - j_rel) - omin)
                col_l.append(f * s + r)
                tap_l.append(j_abs)
    wmat = jnp.zeros((width, C, fold * s, Co), w.dtype)
    # torch convT weight (K, Co, Ci) -> per-tap (Ci, Co); (pos, col) pairs are
    # unique (taps of one output phase land on distinct window offsets)
    wmat = wmat.at[np.array(pos_l), :, np.array(col_l), :].set(
        jnp.transpose(w[np.array(tap_l)], (0, 2, 1)))

    y = jnp.einsum("bswc,wcfo->bsfo", patches, wmat,
                   preferred_element_type=jnp.float32)
    y = y.reshape(B, T * s, Co)
    return y if b is None else y + b


# ---------------------------------------------------------------------------
# Folded-layout ("G-block") tail: the measured-win formulation.
#
# The r3 profile showed the tail's real problem is LAYOUT, not lanes: XLA
# pads a (B, T, 16) bf16 minor dim 16 -> 128, so every elementwise op and
# conv in the 16/32-channel stages moves 8x/4x the bytes (the isolated convs
# are fast — 0.49 ms for ch16 k11 d5 T=153600 — but each stage trio measured
# 7-12 ms, i.e. bandwidth on padded activations). Fix: keep the tail in a
# folded (B, T/F, F*C = 128) layout END TO END. Elementwise ops (lrelu,
# residual adds, mean) are identical on folded data; a stride-1 dilated conv
# becomes y_f = sum_g shift_g(x_f) @ Wg[g] where shift_g is a ROW shift of
# the folded tensor (cheap, lane-aligned) and Wg places tap (j, f) at row
# block (g, u) with g*F + u = f + j*dil - pad - q0*F. Exact: the same MACs
# plus zeros, f32-accumulated.
# ---------------------------------------------------------------------------


def branch_paddings(kernel: int, dilation: int) -> tuple[int, int]:
    """torch get_padding for the (dilated, plain) conv pair of a ResBlock1
    branch (speech-resynthesis models.py:16-60)."""
    return (kernel * dilation - dilation) // 2, (kernel - 1) // 2


def gblock_geometry(kernel: int, dilation: int, pad: int, fold: int):
    """(q0, G): starting row offset and number of row-shifted blocks."""
    span = (kernel - 1) * dilation
    q0 = -((pad + fold - 1) // fold)
    r0 = q0 * fold + pad
    G = ((fold - 1) + span - r0) // fold + 1
    return q0, G


def gblock_placement(kernel: int, dilation: int, pad: int, fold: int,
                     sparse: bool = False):
    """One-hot tap-placement tensor (n_blocks, fold, fold, K) + the absolute
    row offset of each block.

    Tap (f, j) lands in block g = (f + j*dilation - pad - q0*fold) // fold at
    sub-row u, input phase f. sparse=True keeps only blocks that hold at
    least one tap (fold < dilation leaves whole blocks empty — the fused
    kernel skips them; the dense form matches gblock_geometry's G range).
    This is THE placement lattice — both the XLA folded path and the Pallas
    fused kernel build their weight tables from it, so they cannot drift.
    """
    q0, G = gblock_geometry(kernel, dilation, pad, fold)
    cells = [(f, j, *divmod(f + j * dilation - pad - q0 * fold, fold))
             for f in range(fold) for j in range(kernel)]
    occ = sorted({g for (_, _, g, _) in cells}) if sparse else list(range(G))
    gmap = {g: i for i, g in enumerate(occ)}
    P = np.zeros((len(occ), fold, fold, kernel), np.float32)
    for f, j, g, u in cells:
        P[gmap[g], u, f, j] = 1.0
    return P, [q0 + g for g in occ]


def gblock_weights(w: jnp.ndarray, pad: int, dilation: int, fold: int) -> jnp.ndarray:
    """(K, C, Co) conv weight -> (G, fold*C, fold*Co) block weights.

    Built as ONE einsum against the constant one-hot placement tensor: w is
    a traced param, so a scatter-style build would put K*fold tiny
    dynamic-update-slices per conv into every step's graph. Exact — each
    (f, j) tap occupies a distinct cell, so the contraction copies w values.
    """
    K, C, Co = w.shape
    P, offs = gblock_placement(K, dilation, pad, fold)
    Wg = jnp.einsum("gufj,jio->guifo", jnp.asarray(P, w.dtype), w)
    return Wg.reshape(len(offs), fold * C, fold * Co)


def fold_conv1d_gblock(xf: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                       padding: int, dilation: int, fold: int) -> jnp.ndarray:
    """Length-preserving stride-1 conv on FOLDED input.

    xf: (B, M, fold*C) where row m holds samples [m*fold, (m+1)*fold);
    w: (K, C, Co). Returns folded (B, M, fold*Co). Exact (zero padding at
    the sequence ends = zero samples, as the conv requires).

    (A dilation-phase split — d streams of dilation-1 G-blocks, span (K-1)
    instead of (K-1)d — was tried to cut the redundant-MAC factor: measured
    2x SLOWER end-to-end on the chip because the per-conv phase transposes
    materialize thin-minor-dim intermediates in the padded layout. Reverted;
    the straight G-block below is the winning form.)
    """
    B, M, lanes = xf.shape
    K, C, Co = w.shape
    assert lanes == fold * C, (lanes, fold, C)
    q0, G = gblock_geometry(K, dilation, padding, fold)
    Wg = gblock_weights(w, padding, dilation, fold)
    pad_rows = G + abs(q0) + 1
    xp = jnp.pad(xf, ((0, 0), (pad_rows, pad_rows), (0, 0)))
    acc = None
    for g in range(G):
        sh = jax.lax.slice_in_dim(xp, pad_rows + q0 + g,
                                  pad_rows + q0 + g + M, axis=1)
        t = jnp.einsum("bml,lo->bmo", sh, Wg[g],
                       preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    y = acc.astype(xf.dtype)
    if b is not None:
        y = y + jnp.tile(b, fold).astype(y.dtype)
    return y


def fold_time(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """(B, T, C) -> folded (B, T/fold, fold*C). Contiguous reshape."""
    B, T, C = x.shape
    assert T % fold == 0, (T, fold)
    return x.reshape(B, T // fold, fold * C)


def unfold_time(xf: jnp.ndarray, fold: int) -> jnp.ndarray:
    """Folded (B, M, fold*C) -> (B, M*fold, C)."""
    B, M, lanes = xf.shape
    return xf.reshape(B, M * fold, lanes // fold)


def pick_fold(channels: int, t_len: int, target_lanes: int = 128) -> int:
    """Fold factor bringing fold*channels to >= target MXU lanes (bounded by
    divisibility of the sequence length)."""
    f = max(1, target_lanes // max(channels, 1))
    while f > 1 and t_len % f:
        f //= 2
    return f
