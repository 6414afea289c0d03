"""Converter parity for the RAVEn-style encoder layer (layerscale, BatchNorm
FFN pre-norm, no macaron/conv, no norm_final)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.convert import torch_to_jax as conv  # noqa: E402
from lip2speech_tpu.models.conformer import ConformerEncoder  # noqa: E402

from ref_mirror import RefRelMHA, RefFFN  # noqa: E402

D, H, FF, LAYERS, T = 32, 2, 64, 2, 7


class RavenLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = RefRelMHA(D, H)
        self.feed_forward = RefFFN(D, FF)
        self.norm_mha = tnn.LayerNorm(D, eps=1e-12)
        self.norm_ff = tnn.BatchNorm1d(D)          # ff_bn_pre
        self.gamma_ff = tnn.Parameter(0.1 * torch.ones(D))
        self.gamma_mha = tnn.Parameter(0.1 * torch.ones(D))

    def forward(self, x, pos, mask):
        x = x + self.gamma_mha * self.self_attn(self.norm_mha(x), pos, mask)
        y = self.norm_ff(x.transpose(1, 2)).transpose(1, 2)
        return x + self.gamma_ff * self.feed_forward(y)


class RavenEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embed = tnn.Sequential(tnn.Linear(D, D))
        self.encoders = tnn.ModuleList([RavenLayer() for _ in range(LAYERS)])
        self.after_norm = tnn.LayerNorm(D, eps=1e-12)

    @staticmethod
    def rel_pe(t):
        pe_pos, pe_neg = torch.zeros(t, D), torch.zeros(t, D)
        position = torch.arange(0, t, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(torch.arange(0, D, 2, dtype=torch.float32)
                        * -(math.log(10000.0) / D))
        pe_pos[:, 0::2] = torch.sin(position * div)
        pe_pos[:, 1::2] = torch.cos(position * div)
        pe_neg[:, 0::2] = torch.sin(-position * div)
        pe_neg[:, 1::2] = torch.cos(-position * div)
        return torch.cat([torch.flip(pe_pos, [0]), pe_neg[1:]], 0).unsqueeze(0)

    def forward(self, x, mask):
        x = self.embed[0](x) * math.sqrt(D)
        pos = self.rel_pe(x.size(1))
        for lyr in self.encoders:
            x = lyr(x, pos, mask)
        return self.after_norm(x)


def test_raven_layer_conversion_numeric():
    torch.manual_seed(0)
    tm = RavenEncoder().eval()
    for lyr in tm.encoders:
        lyr.norm_ff.running_mean.normal_(0, 0.3)
        lyr.norm_ff.running_var.uniform_(0.5, 2.0)
        lyr.gamma_ff.data.uniform_(0.05, 0.3)
        lyr.gamma_mha.data.uniform_(0.05, 0.3)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, T, D), dtype=np.float32)
    mask = np.ones((2, T), bool)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = conv.convert_conformer_layers(
        sd, "", LAYERS, macaron=False, use_conv=False,
        layerscale=True, ff_bn_pre=True)
    params["embed"] = conv._lin(sd, "embed.0")
    params["after_norm"] = conv._ln(sd, "after_norm")

    enc = ConformerEncoder(dim=D, ffn_dim=FF, heads=H, layers=LAYERS,
                           dropout=0.0, attention_dropout=0.0,
                           positional_dropout=0.0, macaron=False,
                           use_conv=False, layerscale=True, ff_bn_pre=True)
    out, _ = enc.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
