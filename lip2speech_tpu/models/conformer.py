"""Conformer encoder trunk — TPU-native rebuild of the ESPnet conformer.

Math parity targets (all in /root/reference):
  espnet/nets/pytorch_backend/transformer/encoder.py:54-306      (Encoder)
  espnet/nets/pytorch_backend/transformer/encoder_layer.py:17-149 (macaron layer)
  espnet/nets/pytorch_backend/transformer/attention.py:196-280   (rel-MHA, XL shift)
  espnet/nets/pytorch_backend/transformer/embedding.py:155-218   (RelPositionalEncoding)
  espnet/nets/pytorch_backend/transformer/convolution.py:14-73   (conv module)
  raven/_espnet/.../encoder.py:53-330                            (layerscale/drop-path variant)

Design notes (TPU):
  * channel-last (B, T, D) everywhere; all matmuls batched for the MXU
  * the XL relative shift is the zero-pad/reshape trick (pure reshapes, no gather)
  * masking is explicit: additive -inf on scores + multiplicative zero after
    softmax, identical to ESPnet's masked_fill pair
  * static shapes: T is the padded bucket length; masks carry real lengths
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.models.layers import LayerNorm, Linear, BatchNorm, Conv1d
from lip2speech_tpu.ops import nn as ops

MASK_MIN = -1e9  # stands in for torch's dtype-min masked_fill


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift.

    x: (B, H, T, 2T-1) scores against the symmetric position table
    returns (B, H, T, T) where out[i, j] = x[i, (T-1) - i + j].
    Pure pad/reshape/slice — no gathers (XLA lowers to cheap data movement).
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))          # (B,H,T,2T)
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :]                                        # drop the pad row
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[:, :, :, :t]


class RelPositionMultiHeadAttention(nn.Module):
    """Multi-head self-attention with Transformer-XL relative positions."""

    dim: int
    heads: int
    dropout: float = 0.0
    use_flash: bool = False   # Pallas rel-flash kernel: differentiable
                              # (flash fwd + dense-recompute bwd); the only
                              # unsupported case is attention-dropout > 0 in
                              # training, which falls back to the dense path

    @nn.compact
    def __call__(self, x, pos_emb, mask, deterministic: bool = True):
        """x: (B,T,D); pos_emb: (2T-1, D); mask: (B,T) True=valid or None."""
        b, t, d = x.shape
        h, dk = self.heads, d // self.heads

        q = Linear(d, name="linear_q")(x).reshape(b, t, h, dk)
        k = Linear(d, name="linear_k")(x).reshape(b, t, h, dk)
        v = Linear(d, name="linear_v")(x).reshape(b, t, h, dk)
        p = Linear(d, use_bias=False, name="linear_pos")(pos_emb).reshape(-1, h, dk)

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        # Pallas rel-flash kernel: compiled on TPU (the band shear runs as
        # log2 static rolls), interpret mode elsewhere. Fully differentiable
        # (fused flash backward kernel). Attention dropout runs IN-KERNEL on
        # TPU via the Mosaic PRNG (reference recipe's attention_dropout);
        # off-TPU with active dropout we fall through to the dense path
        # (interpret-mode PRNG is stubbed to zeros).
        on_tpu = jax.devices()[0].platform == "tpu"
        attn_rate = 0.0 if deterministic else self.dropout
        if self.use_flash and (attn_rate == 0.0 or on_tpu):
            from lip2speech_tpu.ops.pallas_rel_attention import rel_flash_attention

            seed = None
            if attn_rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1,),
                                          0, 2 ** 31 - 1)
            key_mask = mask if mask is not None else jnp.ones((b, t), bool)
            out = rel_flash_attention(
                (q + bias_u).transpose(0, 2, 1, 3),
                (q + bias_v).transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                p.transpose(1, 0, 2), key_mask,
                interpret=not on_tpu,
                dropout_rate=attn_rate, dropout_seed=seed)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
            return Linear(d, name="linear_out")(out)

        # content score: (B,H,T,T);  position score: (B,H,T,2T-1) -> shift -> (B,H,T,T)
        q_u = (q + bias_u).transpose(0, 2, 1, 3)
        q_v = (q + bias_v).transpose(0, 2, 1, 3)
        k_t = k.transpose(0, 2, 1, 3)
        matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k_t)
        matrix_bd = jnp.einsum("bhqd,phd->bhqp", q_v, p)
        matrix_bd = rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd) / float(np.sqrt(dk))

        if mask is not None:
            m = mask[:, None, None, :]                        # (B,1,1,T) key mask
            scores = jnp.where(m, scores, MASK_MIN)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores, axis=-1)

        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bqhd", attn, v.transpose(0, 2, 1, 3))
        out = out.reshape(b, t, d)
        return Linear(d, name="linear_out")(out)


class FeedForward(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.0
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Linear(self.hidden, name="w_1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return Linear(self.dim, name="w_2")(x)


class ConvModule(nn.Module):
    """Conformer conv module: pointwise->GLU->depthwise(k)->BN->swish->pointwise."""

    dim: int
    kernel: int = 31

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(2 * self.dim, 1, name="pointwise_conv1")(x)
        x = ops.glu(x, axis=-1)
        x = Conv1d(self.dim, self.kernel, padding=(self.kernel - 1) // 2,
                   groups=self.dim, name="depthwise_conv")(x)
        x = BatchNorm(self.dim, name="norm")(x, train)
        x = ops.swish(x)
        return Conv1d(self.dim, 1, name="pointwise_conv2")(x)


class DropPath(nn.Module):
    """Stochastic depth (RAVEn variant, reference raven/_espnet encoder)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class ConformerLayer(nn.Module):
    """Macaron FFN x0.5 + rel-MHA + conv module + FFN, pre-norm, final LN."""

    dim: int
    ffn_dim: int
    heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    conv_kernel: int = 31
    macaron: bool = True
    use_conv: bool = True
    normalize_before: bool = True
    layerscale: bool = False
    init_values: float = 0.1
    drop_path: float = 0.0
    ff_bn_pre: bool = False   # RAVEn: FFN pre-norms are BatchNorm1d, not LN
                              # (raven/_espnet encoder_layer.py:88-101)
    use_flash: bool = False

    def _scale(self, name):
        if not self.layerscale:
            return 1.0
        return self.param(name, lambda k, s: jnp.full(s, self.init_values, jnp.float32),
                          (self.dim,))

    def _ff_norm(self, name, x, train):
        if self.ff_bn_pre:
            return BatchNorm(self.dim, name=name)(x, train)
        return LayerNorm(self.dim, name=name)(x)

    @nn.compact
    def __call__(self, x, pos_emb, mask, train: bool = False):
        det = not train
        drop = nn.Dropout(self.dropout)
        dpath = DropPath(self.drop_path)

        if self.macaron:
            residual = x
            y = self._ff_norm("norm_ff_macaron", x, train) if self.normalize_before else x
            y = FeedForward(self.dim, self.ffn_dim, self.dropout, name="feed_forward_macaron")(y, det)
            x = residual + dpath(0.5 * self._scale("gamma_ff_macaron") * drop(y, deterministic=det), det)
            if not self.normalize_before:
                x = self._ff_norm("norm_ff_macaron", x, train)

        residual = x
        y = LayerNorm(self.dim, name="norm_mha")(x) if self.normalize_before else x
        y = RelPositionMultiHeadAttention(self.dim, self.heads, self.attention_dropout,
                                          use_flash=self.use_flash,
                                          name="self_attn")(y, pos_emb, mask, det)
        x = residual + dpath(self._scale("gamma_mha") * drop(y, deterministic=det), det)
        if not self.normalize_before:
            x = LayerNorm(self.dim, name="norm_mha")(x)

        if self.use_conv:
            residual = x
            y = self._ff_norm("norm_conv", x, train) if self.normalize_before else x
            y = ConvModule(self.dim, self.conv_kernel, name="conv_module")(y, train)
            x = residual + dpath(self._scale("gamma_conv") * drop(y, deterministic=det), det)
            if not self.normalize_before:
                x = self._ff_norm("norm_conv", x, train)

        residual = x
        y = self._ff_norm("norm_ff", x, train) if self.normalize_before else x
        y = FeedForward(self.dim, self.ffn_dim, self.dropout, name="feed_forward")(y, det)
        ff_scale = 0.5 if self.macaron else 1.0
        x = residual + dpath(ff_scale * self._scale("gamma_ff") * drop(y, deterministic=det), det)
        if not self.normalize_before:
            x = self._ff_norm("norm_ff", x, train)

        if self.use_conv:
            x = LayerNorm(self.dim, name="norm_final")(x)
        return x


class ConformerEncoder(nn.Module):
    """Embed (Linear + scaled rel-pos) + N conformer layers + after-norm.

    Covers both the stage-1 trunk (macaron conformer, input_layer="conv3d"
    path minus the frontend — i.e. `forward_after_frontend`) and the RAVEn
    transformer variant (macaron=False, use_conv=False, layerscale/drop_path,
    input_layer="vanilla_linear" = plain Linear without pos-scaling).
    """

    dim: int = 512
    ffn_dim: int = 2048
    heads: int = 8
    layers: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    positional_dropout: float = 0.1
    conv_kernel: int = 31
    macaron: bool = True
    use_conv: bool = True
    normalize_before: bool = True
    layerscale: bool = False
    init_values: float = 0.1
    drop_path: float = 0.0
    ff_bn_pre: bool = False
    remat: bool = False   # jax.checkpoint each layer (trade FLOPs for HBM)
    use_flash: bool = False  # Pallas rel-flash attention (inference path)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, embed_input: bool = True):
        """x: (B, T, F) frontend features; mask: (B, T) True=valid.

        Returns (y, mask): (B, T, dim) encoded, mask unchanged (stride 1).
        """
        det = not train
        if embed_input:
            x = Linear(self.dim, name="embed")(x)
        t = x.shape[1]
        pe = ops.sinusoidal_rel_pos_encoding(t, self.dim)
        x = x * float(np.sqrt(self.dim))
        x = nn.Dropout(self.positional_dropout)(x, deterministic=det)
        pos_emb = nn.Dropout(self.positional_dropout)(jnp.asarray(pe, dtype=x.dtype), deterministic=det)

        layer_cls = (nn.remat(ConformerLayer, static_argnums=(4,))
                     if self.remat else ConformerLayer)
        for i in range(self.layers):
            x = layer_cls(
                dim=self.dim, ffn_dim=self.ffn_dim, heads=self.heads,
                dropout=self.dropout, attention_dropout=self.attention_dropout,
                conv_kernel=self.conv_kernel, macaron=self.macaron,
                use_conv=self.use_conv, normalize_before=self.normalize_before,
                layerscale=self.layerscale, init_values=self.init_values,
                drop_path=self.drop_path * i / max(self.layers - 1, 1),
                ff_bn_pre=self.ff_bn_pre, use_flash=self.use_flash,
                name=f"layers_{i}",
            )(x, pos_emb, mask, train)

        if self.normalize_before:
            x = LayerNorm(self.dim, name="after_norm")(x)
        return x, mask
