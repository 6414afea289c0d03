"""Neural-net primitives with PyTorch numeric semantics, TPU-native layouts.

All ops use channel-LAST layouts (B, ..., C) — the layout XLA tiles best on
TPU — while reproducing PyTorch's padding/stride/dilation conventions exactly,
so converted reference checkpoints are numerically faithful (SURVEY.md §7
"hard parts": conv padding conventions, BatchNorm stats, weight-norm folding).

Weight layouts (converter transposes from torch at load time):
  conv1d:           (K, Cin/groups, Cout)        torch: (Cout, Cin/groups, K)
  conv2d:           (Kh, Kw, Cin/groups, Cout)   torch: (Cout, Cin/groups, Kh, Kw)
  conv3d:           (Kt, Kh, Kw, Cin, Cout)      torch: (Cout, Cin, Kt, Kh, Kw)
  conv_transpose1d: (K, Cout, Cin)               torch: (Cin, Cout, K)
  linear:           (Din, Dout)                  torch: (Dout, Din)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """(B, T, Cin) x (K, Cin/groups, Cout) -> (B, T', Cout). torch.nn.Conv1d."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out


def conv1d_group_packed(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    lanes: int = 128,
) -> jnp.ndarray:
    """Grouped conv1d with groups LANE-PACKED into block-diagonal dense blocks.

    A grouped conv with Cout/groups < 128 can use at most (Cout/groups)/128
    of the MXU's output lanes — the reference MSD's g=16 convs
    (speech-resynthesis models.py DiscriminatorS) run 16-64 lanes wide, and
    measured on the chip they dominate the stage-2 GAN step (MSD grad
    36.7 ms of the 77.8 ms step; MPD after batched-period layout: 3.6 ms).

    Reformulation: merge `pack = lanes // (Cout/groups)` adjacent groups into
    one dense group whose weight is BLOCK-DIAGONAL (structural zeros off the
    blocks), dropping feature_group_count by `pack` and filling all 128
    output lanes. The extra MACs multiply zeros, so outputs and gradients
    are exact (grads to the off-block positions are discarded by the
    einsum-with-identity construction). FLOPs inflate x pack — the trade
    the chip-validated fused vocoder tail already wins: these convs are
    lane-bound, not FLOP-bound.

    x: (B, T, Cin); w: (K, Cin/groups, Cout). Same contract as conv1d.
    """
    k, cin_g, cout = w.shape
    cout_g = cout // groups
    pack = max(1, min(groups, lanes // max(cout_g, 1)))
    if pack <= 1:
        return conv1d(x, w, b, stride, padding, 1, groups)
    gsets = groups // pack
    # w (K, Cin_g, Cout) -> (K, Cin_g, gsets, pack, Cout_g); the packed dense
    # weight puts original group p of a set at input-block row b==p:
    # w'[k, b*Cin_g + i, (s*pack + p)*Cout_g + o] = w[...] * eye[b, p]
    w5 = w.reshape(k, cin_g, gsets, pack, cout_g)
    eye = jnp.eye(pack, dtype=w.dtype)
    wp = jnp.einsum("kispo,bp->kbispo", w5, eye).reshape(
        k, pack * cin_g, cout)
    return conv1d(x, wp, b, stride, padding, 1, gsets)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
) -> jnp.ndarray:
    """(B, H, W, Cin) x (Kh, Kw, Cin/groups, Cout) -> (B, H', W', Cout)."""
    s, p, d = _pair(stride), _pair(padding), _pair(dilation)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out


def conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=(1, 1, 1),
    padding=(0, 0, 0),
) -> jnp.ndarray:
    """(B, T, H, W, Cin) x (Kt, Kh, Kw, Cin, Cout) -> (B, T', H', W', Cout)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv1d_timestack(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """conv1d for thin input channels: taps folded into a pointwise matmul.

    The discriminators' first convs (Cin=1, k=5/15) hit the same XLA
    pathology as the 3-D stem — a 1-element contraction leaves the MXU idle
    and the activations live in a 128x lane-padded layout. Stacking the K
    time-shifted copies as channels makes the op one (K*Cin)-deep matmul.
    x: (B, T, Cin); w: (K, Cin, Co). Exact (same MACs).
    """
    B, T, Cin = x.shape
    K, _, Co = w.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    T_out = (T + 2 * padding - K) // stride + 1
    xs = jnp.concatenate([xp[:, u:u + T + 2 * padding - K + 1] for u in range(K)],
                         axis=-1)
    if stride > 1:
        xs = xs[:, ::stride]
    xs = xs[:, :T_out]
    y = jnp.einsum("btk,ko->bto", xs, w.reshape(K * Cin, Co),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def conv3d_timestack(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=(1, 1, 1),
    padding=(0, 0, 0),
) -> jnp.ndarray:
    """conv3d reformulated for thin input channels (the ResNet stem's Cin=1).

    A direct Conv3d(1->64, k(5,7,7)) leaves the MXU contraction dimension at
    Cin=1 and measures ~3.7% MFU on TPU v5e (8.6 ms for the serving batch).
    With temporal stride 1, the kt taps can be folded into input CHANNELS:
    stack kt time-shifted copies of the input, then run one 2-D conv with
    Cin' = kt*Cin — the identical MACs with a 245-deep contraction. Measured
    4.2x faster (2.6 ms) on the same shapes; exact up to bf16 accumulation
    order (the patches+GEMM variant of the same reindexing is bit-exact).

    Requires stride[0] == 1 AND length-preserving temporal padding
    (2*padding[0] == Kt-1): the slice construction always emits T output
    frames. x: (B, T, H, W, Cin); w: (Kt, Kh, Kw, Cin, Cout).
    """
    assert stride[0] == 1, "time stride must be 1 for the time-stack form"
    B, T, H, W, Cin = x.shape
    Kt, Kh, Kw, _, Cout = w.shape
    pt = padding[0]
    if 2 * pt != Kt - 1:
        raise ValueError(
            f"conv3d_timestack needs same-length temporal padding "
            f"(2*pt == Kt-1); got Kt={Kt}, padding[0]={pt} — use conv3d")
    xp = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    # (B, T, H, W, Kt*Cin); channel block dt holds frame t + dt - pt
    xs = jnp.concatenate([xp[:, dt:dt + T] for dt in range(Kt)], axis=-1)
    # kernel (Kh, Kw, Kt*Cin, Cout): tap (dt, c) sits at channel dt*Cin + c
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(Kh, Kw, Kt * Cin, Cout)
    y = jax.lax.conv_general_dilated(
        xs.reshape(B * T, H, W, Kt * Cin),
        w2,
        window_strides=tuple(stride[1:]),
        padding=[(padding[1], padding[1]), (padding[2], padding[2])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(B, T, y.shape[1], y.shape[2], Cout)
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """(B, T, Cin) x (K, Cout, Cin) -> (B, (T-1)*stride - 2*padding + K, Cout).

    torch.nn.ConvTranspose1d semantics (output_padding=0), expressed as a
    fractionally-strided conv: lhs_dilation=stride, spatially flipped kernel,
    pad (K-1-padding) both sides.
    """
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)  # (K, Cout, Cin) flipped in time
    out = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WOI", "NWC"),
    )
    if b is not None:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def batch_norm(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inference-mode batch norm over the trailing channel dim."""
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * gamma + beta


def batch_norm_train(
    x: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    momentum: float = 0.1,
    axis_name: str | None = None,
):
    """Training-mode batch norm (channel-last); returns (y, new_mean, new_var).

    Batch statistics are computed over all non-channel dims; if axis_name is
    given they are additionally psum-averaged over that mesh axis (the
    sync-BN equivalent — torch BN is per-replica, but cross-replica stats only
    help; pass axis_name=None for exact torch behavior).
    """
    reduce_axes = tuple(range(x.ndim - 1))
    n = np.prod([x.shape[a] for a in reduce_axes]).astype(np.float32)
    # statistics ALWAYS in f32: under bf16 compute, a bf16-accumulated mean
    # and a bf16 momentum update quantize away running-stat drift (updates
    # below ~0.4% of the stat round to zero once roughly converged)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    var = mean_sq - jnp.square(mean)
    # normalization stays on the input dtype grid (bf16 activations in, bf16
    # out) — only the statistics and their running update are f32
    scale = (jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * scale + beta
    # torch updates running_var with the UNBIASED batch variance
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_mean = (1 - momentum) * running_mean.astype(jnp.float32) + momentum * mean
    new_var = (1 - momentum) * running_var.astype(jnp.float32) + momentum * unbiased
    return y, new_mean, new_var


def layer_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """LayerNorm over the last dim. Default eps matches ESPnet's LayerNorm
    (reference espnet .../transformer/layer_norm.py: eps=1e-12)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


# ---------------------------------------------------------------------------
# Activations / misc
# ---------------------------------------------------------------------------


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha * x)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def max_pool3d(
    x: jnp.ndarray,
    kernel=(1, 3, 3),
    stride=(1, 2, 2),
    padding=(0, 1, 1),
) -> jnp.ndarray:
    """(B, T, H, W, C) max pool with torch padding (pads with -inf)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding=[(0, 0)] + [(p, p) for p in padding] + [(0, 0)],
    )


def avg_pool1d(
    x: jnp.ndarray, kernel: int, stride: int, padding: int
) -> jnp.ndarray:
    """(B, T, C) average pool, count_include_pad=True (torch AvgPool1d default)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=[(0, 0), (padding, padding), (0, 0)],
    )
    return summed / kernel


def fold_weight_norm(v: np.ndarray, g: np.ndarray, dim: int = 0) -> np.ndarray:
    """Fold torch weight_norm params: w = g * v / ||v|| (norm over all dims
    except `dim`). Applied once at checkpoint conversion, mirroring
    remove_weight_norm at reference vocoder inference (inference.py:62)."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
    return (g.reshape(norm.shape) / norm) * v


def sinusoidal_rel_pos_encoding(length: int, d_model: int) -> np.ndarray:
    """Transformer-XL style symmetric relative positions, shape (2L-1, d).

    Row 0 is relative position +(L-1) (query far right of key) down to
    -(L-1); matches ESPnet RelPositionalEncoding.extend_pe
    (reference espnet .../transformer/embedding.py:155-218).
    """
    pos = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(np.log(10000.0) / d_model))
    pe_pos = np.zeros((length, d_model), dtype=np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((length, d_model), dtype=np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def dequantize_video(video: jnp.ndarray) -> jnp.ndarray:
    """uint8 wire-format video -> normalized float32 ON DEVICE.

    Training batches ship video as uint8 (data/transforms.prepare_video
    emit_uint8) because host->device bandwidth, not FLOPs, bounds the train
    step (NOTES r3); this is the matching device-side (x/255 - mean)/std.
    float inputs pass through unchanged (already normalized on host)."""
    if video.dtype != jnp.uint8:
        return video
    from lip2speech_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD

    return (video.astype(jnp.float32) / 255.0 - IMAGE_MEAN) / IMAGE_STD
