"""Multi-input HiFi-GAN vocoder: units + mel + speaker embedding -> 16 kHz wav.

Rebuild of reference multi_input_vocoder/models_multi_input.py:26-97 (the
MelCodeGenerator conditioning stack) + speech-resynthesis/models.py:16-229
(HiFi-GAN generator) and :232-387 (MPD/MSD discriminators + LSGAN losses),
config multi_input_vocoder/configs/lrs3/multi_input.json.

Design notes (TPU):
  * channel-last (B, T, C); the 320x upsample chain is 5 ConvTranspose1d
    stages each followed by 3 dilated resblocks — all plain XLA convs that
    fuse with their leaky-relus
  * generator/discriminator convs keep the torch weight_norm (g, v)
    parametrization so training dynamics match the reference; `fold()` in the
    converter produces plain weights for serving
  * MSD's first discriminator uses spectral norm (power-iteration state lives
    in the 'spectral' variable collection)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.core.config import VocoderConfig
from lip2speech_tpu.models.layers import Linear, normal_init, torch_uniform_init
from lip2speech_tpu.ops import nn as ops

LRELU_SLOPE = 0.1


def _wn_weight(module: nn.Module, shape, fan_in: int, init_std: float | None):
    """Create (v, g) weight-norm params and return the composed weight.

    Norm is over all dims except the output-channel dim, which is the LAST dim
    for conv1d layout (K, I, O) and the SECOND for conv_transpose layout
    (K, O, I) — we standardize on norm over all-but-last and store transpose
    kernels as (K, I, O) too, flipping to (K, O, I) at call time.
    """
    if init_std is not None:
        vinit = normal_init(init_std)
    else:
        vinit = torch_uniform_init(fan_in)
    v = module.param("weight_v", vinit, shape)
    g = module.param(
        "weight_g",
        lambda key, s: jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0).reshape(s),
        (v.shape[-1],),
    )
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)), keepdims=True))
    return v * (g / norm)


class WNConv1d(nn.Module):
    """Weight-normed Conv1d (torch weight_norm(Conv1d(...))).

    fold > 1 computes the conv as an output-time-folded matmul
    (ops/fold_conv.py, exact) — same params, MXU-shaped compute.

    gfold > 1 means the INPUT IS FOLDED (B, T/gfold, gfold*C) and the output
    stays folded: the G-block form (fold_conv1d_gblock) that keeps the
    small-channel tail packed in 128 lanes (see ops/fold_conv.py notes).
    Parameter shapes are identical to the unfolded conv."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    init_std: float | None = 0.01  # HiFi-GAN init_weights(mean=0, std=0.01)
    fold: int = 1
    gfold: int = 1

    @nn.compact
    def weights(self, in_dim: int):
        """Create the (weight_v, weight_g, bias) params and return the
        composed (w, b). Param structure is identical whether the conv runs
        through __call__ or a fused kernel pulls the raw weights."""
        fan_in = (in_dim // self.groups) * self.kernel_size
        w = _wn_weight(self, (self.kernel_size, in_dim // self.groups, self.features),
                       fan_in, self.init_std)
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        return w, b

    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.gfold > 1:
            assert self.stride == 1 and self.groups == 1
            in_dim //= self.gfold
        w, b = self.weights(in_dim)
        from lip2speech_tpu.ops import fold_conv as fc

        if self.gfold > 1:
            return fc.fold_conv1d_gblock(x, w, b, self.padding, self.dilation,
                                         self.gfold)
        if self.fold > 1 and self.stride == 1 and self.groups == 1:
            return fc.fold_conv1d(x, w, b, self.padding, self.dilation,
                                  self.fold)
        return ops.conv1d(x, w, b, self.stride, self.padding, self.dilation, self.groups)


class WNConvTranspose1d(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int
    init_std: float | None = 0.01
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        fan_in = in_dim * self.kernel_size
        # stored (K, O, I): torch weight_norm(ConvTranspose1d) uses dim=0,
        # i.e. the norm/g are per INPUT channel — so g sits on our last axis
        w = _wn_weight(self, (self.kernel_size, self.features, in_dim), fan_in, self.init_std)
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        if self.fold > 1 and self.kernel_size == self.stride + 2 * self.padding:
            from lip2speech_tpu.ops import fold_conv as fc

            return fc.fold_conv_transpose1d(x, w, b, self.stride,
                                            self.padding, self.fold)
        return ops.conv_transpose1d(x, w, b, self.stride, self.padding)


def _spectral_weight(module: nn.Module, shape, fan_in: int, train: bool):
    """torch.nn.utils.spectral_norm: w / sigma(w), one power iteration per
    training step. Spectral norm is invariant to our (K, I, O) vs torch's
    (O, I, K) flattening (column permutation preserves singular values)."""
    w = module.param("weight", torch_uniform_init(fan_in), shape)
    w2d = w.reshape(-1, shape[-1]).T  # (out, rest)
    u_var = module.variable("spectral", "u",
                            lambda: jax.random.normal(jax.random.PRNGKey(0), (shape[-1],)))
    u = u_var.value
    if train and not module.is_initializing():
        v = w2d.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w2d @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        u_var.value = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        u = jax.lax.stop_gradient(u)
    else:
        v = w2d.T @ u
        v = jax.lax.stop_gradient(v / (jnp.linalg.norm(v) + 1e-12))
    sigma = u @ (w2d @ v)
    return w / sigma


class WNConv2d(nn.Module):
    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    spectral: bool = False  # MSD[0] uses spectral_norm instead of weight_norm

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_dim * kh * kw
        shape = (kh, kw, in_dim, self.features)
        if self.spectral:
            w = _spectral_weight(self, shape, fan_in, train)
        else:
            w = _wn_weight(self, shape, fan_in, None)
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        if kw == 1 and x.shape[2] == 1 and in_dim * kh <= 16:
            # W-degenerate thin-channel conv (DiscriminatorP's first conv in
            # the batched-period layout): timestack the kh taps into one
            # matmul instead of a Cin=1 conv (ops.conv1d_timestack)
            y = ops.conv1d_timestack(x[:, :, 0, :], w[:, 0], b,
                                     self.stride[0], self.padding[0])
            return y[:, :, None, :]
        return ops.conv2d(x, w, b, self.stride, self.padding)


class SpectralOrWNConv1d(nn.Module):
    """Conv1d with weight_norm or spectral_norm (for DiscriminatorS)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    spectral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        fan_in = (in_dim // self.groups) * self.kernel_size
        shape = (self.kernel_size, in_dim // self.groups, self.features)
        if self.spectral:
            w = _spectral_weight(self, shape, fan_in, train)
        else:
            w = _wn_weight(self, shape, fan_in, None)
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        if self.groups == 1 and in_dim * self.kernel_size <= 16:
            # MSD's first conv (Cin=1, k=15): timestack taps -> one matmul
            return ops.conv1d_timestack(x, w, b, self.stride, self.padding)
        if self.groups > 1 and self.features // self.groups < 128:
            # 16-64-lane grouped convs dominate the GAN step on TPU —
            # lane-pack groups into block-diagonal dense blocks (exact)
            return ops.conv1d_group_packed(x, w, b, self.stride,
                                           self.padding, self.groups)
        return ops.conv1d(x, w, b, self.stride, self.padding, 1, self.groups)


class ResBlock1(nn.Module):
    """HiFi-GAN ResBlock1: 3x [lrelu->dilated conv->lrelu->conv] residual pairs.

    gfold > 1: input/output are folded (B, T/gfold, gfold*channels); all
    elementwise ops run on the packed layout, convs use the G-block form."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3, 5)
    fold: int = 1
    gfold: int = 1

    @nn.compact
    def branch_weights(self):
        """Composed (w, b) pairs for every conv: [((w1, b1), (w2, b2)), ...]
        per dilation branch. The single compact method — both __call__ and
        the generator's fused-tail path pull params through here, so the
        checkpoint tree is identical either way."""
        from lip2speech_tpu.ops.fold_conv import branch_paddings

        out = []
        for i, d in enumerate(self.dilations):
            pad1, pad2 = branch_paddings(self.kernel_size, d)
            c1 = WNConv1d(self.channels, self.kernel_size, padding=pad1,
                          dilation=d, fold=self.fold, gfold=self.gfold,
                          name=f"convs1_{i}")
            c2 = WNConv1d(self.channels, self.kernel_size, padding=pad2,
                          dilation=1, fold=self.fold, gfold=self.gfold,
                          name=f"convs2_{i}")
            out.append((c1.weights(self.channels), c2.weights(self.channels)))
        return out

    def _conv(self, x, w, b, pad: int, dil: int):
        from lip2speech_tpu.ops import fold_conv as fc

        if self.gfold > 1:
            return fc.fold_conv1d_gblock(x, w, b, pad, dil, self.gfold)
        if self.fold > 1:
            return fc.fold_conv1d(x, w, b, pad, dil, self.fold)
        return ops.conv1d(x, w, b, 1, pad, dil, 1)

    def __call__(self, x):
        from lip2speech_tpu.ops.fold_conv import branch_paddings

        ws = self.branch_weights()
        for ((w1, b1), (w2, b2)), d in zip(ws, self.dilations):
            pad1, pad2 = branch_paddings(self.kernel_size, d)
            xt = ops.leaky_relu(x, LRELU_SLOPE)
            xt = self._conv(xt, w1, b1, pad1, d)
            xt = ops.leaky_relu(xt, LRELU_SLOPE)
            xt = self._conv(xt, w2, b2, pad2, 1)
            x = xt + x
        return x


class HiFiGANGenerator(nn.Module):
    """conv_pre -> 5x [lrelu, ConvTranspose up, mean of 3 resblocks] -> conv_post."""

    cfg: VocoderConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, T, model_in_dim) conditioning at 100 Hz -> (B, 320*T/2) ... wav."""
        h = self.cfg
        x = WNConv1d(h.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        num_kernels = len(h.resblock_kernel_sizes)

        def stage_fold(ch: int, t_len: int) -> int:
            if not h.mxu_fold:
                return 1
            from lip2speech_tpu.ops.fold_conv import pick_fold

            return pick_fold(ch, t_len)

        from lip2speech_tpu.ops import fold_conv as fc

        cur_f = 1  # current folded factor of x (1 = plain (B, T, C) layout)
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            t_out = x.shape[1] * cur_f * u
            f = stage_fold(ch, t_out)
            gf = 128 // ch if (h.fold_tail and 128 // ch >= 2
                               and t_out % (128 // ch) == 0) else 1
            x = ops.leaky_relu(x, LRELU_SLOPE)       # packed when folded
            if cur_f > 1:
                x = fc.unfold_time(x, cur_f)
            # the transpose's own output folding spans stride*fold_in lanes
            x = WNConvTranspose1d(ch, k, u, (k - u) // 2,
                                  fold=max(1, f // u) if f > 1 else 1,
                                  name=f"ups_{i}")(x)
            if gf > 1:
                x = fc.fold_time(x, gf)
            rbs = [ResBlock1(ch, rk, tuple(rd), fold=f, gfold=gf,
                             name=f"resblocks_{i * num_kernels + j}")
                   for j, (rk, rd) in enumerate(
                       zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes))]
            if h.fused_tail_kernel and f == 1 and gf * ch == 128:
                # whole trio fused in VMEM: one HBM read + write per stage
                # (ops/pallas_fused_tail.py; XLA-path gradients via
                # custom_vjp). Exactly-128-lane stages only: the wider
                # ch-256 stage's G-block weight table alone would exceed
                # VMEM (126 blocks x 256 x 256)
                from lip2speech_tpu.ops.pallas_fused_tail import fused_resblock_trio

                ws = [rb.branch_weights() for rb in rbs]
                x = fused_resblock_trio(
                    x, ws, gf, h.resblock_kernel_sizes,
                    [tuple(rd) for rd in h.resblock_dilation_sizes],
                    interpret=jax.devices()[0].platform != "tpu")
            else:
                acc = None
                for rb in rbs:
                    y = rb(x)
                    acc = y if acc is None else acc + y
                x = acc / num_kernels
            cur_f = gf
        x = ops.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope here
        if cur_f > 1:
            # conv_post stays folded: (B, M, cur_f*1) -> (B, T, 1)
            x = WNConv1d(1, 7, padding=3, gfold=cur_f, name="conv_post")(x)
            x = fc.unfold_time(x, cur_f)
        else:
            x = WNConv1d(1, 7, padding=3, fold=stage_fold(1, x.shape[1]),
                         name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class MelCodeGenerator(nn.Module):
    """Stage-2 entry: dict emb + 2x deconv on codes, mel, projected speaker."""

    cfg: VocoderConfig

    @nn.compact
    def __call__(self, code, mel, spk_emb, deterministic: bool = True):
        """code: (B, Tc) int32 units (0..199); mel: (B, 2*Tc, 80); spk: (B, 256).

        Returns (B, 320*Tc) waveform in [-1, 1].
        """
        h = self.cfg
        emb = nn.Embed(h.num_embeddings, h.embedding_dim,
                       embedding_init=nn.initializers.normal(1.0), name="dict")(code)
        # ConvTranspose1d(128,128,k4,s2,p1) + GELU: 50 Hz -> 100 Hz
        y = WNConvTranspose1d(h.embedding_dim, 4, 2, 1, init_std=None, name="code_upsample")(emb)
        y = ops.gelu(y)
        y = nn.Dropout(0.1)(y, deterministic=deterministic)
        y = Linear(h.embedding_dim, name="code_fc")(y)          # (B, 2Tc, 128)

        spk = Linear(h.embedding_dim, name="spkr")(spk_emb)     # (B, 128)
        spk = jnp.broadcast_to(spk[:, None, :], (y.shape[0], y.shape[1], h.embedding_dim))

        x = jnp.concatenate([mel, y, spk], axis=-1)             # (B, 2Tc, 336)
        return HiFiGANGenerator(h, name="generator")(x)


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


class DiscriminatorP(nn.Module):
    """Period discriminator: fold wav into (T/p, p) and run (5,1) conv stack."""

    period: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) -> (score (B, N), fmap list).

        TPU layout: every kernel here is (k, 1) — the period dim never
        mixes — so it rides in the BATCH dim ((b*p, H, 1, C)) instead of a
        spatial dim. The reference layout (b, H, p, C) keeps C=1..32 minor
        dims that XLA pads to 128 lanes (measured: the discriminator
        backward dominated the GAN step). fmaps are restored to the
        (b, H, p, C) interface, so scores/FM losses/oracles are unchanged.
        """
        b, t = x.shape
        p = self.period
        if t % p != 0:
            pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            t = t + pad
        x = (x.reshape(b, t // p, p).transpose(0, 2, 1)
             .reshape(b * p, t // p, 1, 1))

        def restore(y):
            bp, h, _, c = y.shape
            return y.reshape(b, p, h, c).transpose(0, 2, 1, 3)

        fmap = []
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = WNConv2d(ch, (5, 1), (3, 1), (2, 0), name=f"convs_{i}")(x, train)
            x = ops.leaky_relu(x, LRELU_SLOPE)
            fmap.append(restore(x))
        x = WNConv2d(1024, (5, 1), (1, 1), (2, 0), name="convs_4")(x, train)
        x = ops.leaky_relu(x, LRELU_SLOPE)
        fmap.append(restore(x))
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), name="conv_post")(x, train)
        fmap.append(restore(x))
        return restore(x).reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped conv1d stack on the raw waveform."""

    spectral: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T) -> (score, fmap)."""
        x = x[..., None]
        fmap = []
        specs = [
            (128, 15, 1, 7, 1), (128, 41, 2, 20, 4), (256, 41, 2, 20, 16),
            (512, 41, 4, 20, 16), (1024, 41, 4, 20, 16), (1024, 41, 1, 20, 16),
            (1024, 5, 1, 2, 1),
        ]
        for i, (ch, k, s, pad, g) in enumerate(specs):
            x = SpectralOrWNConv1d(ch, k, s, pad, g, self.spectral, name=f"convs_{i}")(x, train)
            x = ops.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = SpectralOrWNConv1d(1, 3, 1, 1, 1, self.spectral, name="conv_post")(x, train)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        rs, gs, fr, fg = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"disc_p{p}")
            sr, fmr = d(y, train)
            sg, fmg = d(y_hat, train)
            rs.append(sr); gs.append(sg); fr.append(fmr); fg.append(fmg)
        return rs, gs, fr, fg


class MultiScaleDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        rs, gs, fr, fg = [], [], [], []
        for i in range(3):
            if i != 0:
                y = ops.avg_pool1d(y[..., None], 4, 2, 2)[..., 0]
                y_hat = ops.avg_pool1d(y_hat[..., None], 4, 2, 2)[..., 0]
            d = DiscriminatorS(spectral=(i == 0), name=f"disc_s{i}")
            sr, fmr = d(y, train)
            sg, fmg = d(y_hat, train)
            rs.append(sr); gs.append(sg); fr.append(fmr); fg.append(fmg)
        return rs, gs, fr, fg


# ---------------------------------------------------------------------------
# GAN losses (reference speech-resynthesis/models.py:356-387)
# ---------------------------------------------------------------------------


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(real_outs, gen_outs):
    loss = 0.0
    for dr, dg in zip(real_outs, gen_outs):
        loss += jnp.mean(jnp.square(1.0 - dr)) + jnp.mean(jnp.square(dg))
    return loss


def generator_adv_loss(gen_outs):
    loss = 0.0
    for dg in gen_outs:
        loss += jnp.mean(jnp.square(1.0 - dg))
    return loss
