"""Numerical parity of the conformer trunk against a torch mirror.

The mirror below re-derives the ESPnet conformer math (macaron FFN x0.5,
Transformer-XL rel-MHA, conv module with BN+swish, pre-norm, eps=1e-12) from
torch primitives; random torch weights are transplanted into our flax params
and outputs compared. This is the load-bearing guarantee that converted
reference checkpoints will be numerically faithful.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.models.conformer import ConformerEncoder  # noqa: E402

D, H, FF, LAYERS, T, B = 64, 4, 128, 2, 9, 2


class TorchRelMHA(tnn.Module):
    def __init__(self):
        super().__init__()
        self.linear_q = tnn.Linear(D, D)
        self.linear_k = tnn.Linear(D, D)
        self.linear_v = tnn.Linear(D, D)
        self.linear_out = tnn.Linear(D, D)
        self.linear_pos = tnn.Linear(D, D, bias=False)
        self.pos_bias_u = tnn.Parameter(torch.randn(H, D // H))
        self.pos_bias_v = tnn.Parameter(torch.randn(H, D // H))

    @staticmethod
    def rel_shift(x):
        zero_pad = torch.zeros((*x.size()[:3], 1), dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(*x.size()[:2], x.size(3) + 1, x.size(2))
        return x_padded[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]

    def forward(self, x, pos_emb, mask):
        b, t, _ = x.shape
        dk = D // H
        q = self.linear_q(x).view(b, t, H, dk)
        k = self.linear_k(x).view(b, t, H, dk).transpose(1, 2)
        v = self.linear_v(x).view(b, t, H, dk).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, H, dk).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        ac = torch.matmul(q_u, k.transpose(-2, -1))
        bd = self.rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))
        scores = (ac + bd) / math.sqrt(dk)
        if mask is not None:
            m = mask[:, None, None, :].eq(0)
            scores = scores.masked_fill(m, torch.finfo(scores.dtype).min)
            attn = torch.softmax(scores, dim=-1).masked_fill(m, 0.0)
        else:
            attn = torch.softmax(scores, dim=-1)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, t, D)
        return self.linear_out(out)


class TorchConvModule(tnn.Module):
    def __init__(self, kernel=7):
        super().__init__()
        self.pw1 = tnn.Conv1d(D, 2 * D, 1)
        self.dw = tnn.Conv1d(D, D, kernel, padding=(kernel - 1) // 2, groups=D)
        self.bn = tnn.BatchNorm1d(D)
        self.pw2 = tnn.Conv1d(D, D, 1)

    def forward(self, x):
        x = x.transpose(1, 2)
        x = F.glu(self.pw1(x), dim=1)
        x = self.dw(x)
        x = self.bn(x)
        x = x * torch.sigmoid(x)
        return self.pw2(x).transpose(1, 2)


class TorchFFN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.w_1 = tnn.Linear(D, FF)
        self.w_2 = tnn.Linear(FF, D)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class TorchConformerLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.ff_mac = TorchFFN()
        self.attn = TorchRelMHA()
        self.conv = TorchConvModule()
        self.ffn = TorchFFN()
        ln = lambda: tnn.LayerNorm(D, eps=1e-12)  # noqa: E731
        self.norm_ff_macaron, self.norm_mha = ln(), ln()
        self.norm_conv, self.norm_ff, self.norm_final = ln(), ln(), ln()

    def forward(self, x, pos_emb, mask):
        x = x + 0.5 * self.ff_mac(self.norm_ff_macaron(x))
        x = x + self.attn(self.norm_mha(x), pos_emb, mask)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.ffn(self.norm_ff(x))
        return self.norm_final(x)


class TorchConformer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embed = tnn.Linear(D, D)
        self.layers = tnn.ModuleList([TorchConformerLayer() for _ in range(LAYERS)])
        self.after_norm = tnn.LayerNorm(D, eps=1e-12)

    @staticmethod
    def rel_pe(t):
        pe_pos = torch.zeros(t, D)
        pe_neg = torch.zeros(t, D)
        position = torch.arange(0, t, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(torch.arange(0, D, 2, dtype=torch.float32) * -(math.log(10000.0) / D))
        pe_pos[:, 0::2] = torch.sin(position * div)
        pe_pos[:, 1::2] = torch.cos(position * div)
        pe_neg[:, 0::2] = torch.sin(-position * div)
        pe_neg[:, 1::2] = torch.cos(-position * div)
        return torch.cat([torch.flip(pe_pos, [0]), pe_neg[1:]], dim=0).unsqueeze(0)

    def forward(self, x, mask):
        x = self.embed(x) * math.sqrt(D)
        pos = self.rel_pe(x.size(1))
        for layer in self.layers:
            x = layer(x, pos, mask)
        return self.after_norm(x)


def _lin(m):  # torch Linear -> flax {weight (in,out), bias}
    p = {"weight": m.weight.detach().numpy().T}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def _ln(m):
    return {"weight": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def _conv1d(m):
    return {"weight": m.weight.detach().numpy().transpose(2, 1, 0),
            "bias": m.bias.detach().numpy()}


def transplant(tm: TorchConformer):
    params = {"embed": _lin(tm.embed), "after_norm": _ln(tm.after_norm)}
    stats = {}
    for i, lyr in enumerate(tm.layers):
        lp = {
            "feed_forward_macaron": {"w_1": _lin(lyr.ff_mac.w_1), "w_2": _lin(lyr.ff_mac.w_2)},
            "feed_forward": {"w_1": _lin(lyr.ffn.w_1), "w_2": _lin(lyr.ffn.w_2)},
            "self_attn": {
                "linear_q": _lin(lyr.attn.linear_q), "linear_k": _lin(lyr.attn.linear_k),
                "linear_v": _lin(lyr.attn.linear_v), "linear_out": _lin(lyr.attn.linear_out),
                "linear_pos": _lin(lyr.attn.linear_pos),
                "pos_bias_u": lyr.attn.pos_bias_u.detach().numpy(),
                "pos_bias_v": lyr.attn.pos_bias_v.detach().numpy(),
            },
            "conv_module": {
                "pointwise_conv1": _conv1d(lyr.conv.pw1),
                "depthwise_conv": _conv1d(lyr.conv.dw),
                "pointwise_conv2": _conv1d(lyr.conv.pw2),
                "norm": {"weight": lyr.conv.bn.weight.detach().numpy(),
                         "bias": lyr.conv.bn.bias.detach().numpy()},
            },
            "norm_ff_macaron": _ln(lyr.norm_ff_macaron), "norm_mha": _ln(lyr.norm_mha),
            "norm_conv": _ln(lyr.norm_conv), "norm_ff": _ln(lyr.norm_ff),
            "norm_final": _ln(lyr.norm_final),
        }
        params[f"layers_{i}"] = lp
        stats[f"layers_{i}"] = {"conv_module": {"norm": {
            "running_mean": lyr.conv.bn.running_mean.numpy(),
            "running_var": lyr.conv.bn.running_var.numpy(),
        }}}
    return {"params": params, "batch_stats": stats}


def test_conformer_trunk_parity():
    torch.manual_seed(0)
    tm = TorchConformer().eval()
    # randomize BN stats so eval-mode BN is actually exercised
    for lyr in tm.layers:
        lyr.conv.bn.running_mean.normal_()
        lyr.conv.bn.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, T, D), dtype=np.float32)
    lengths = [T, T - 3]
    mask = np.zeros((B, T), bool)
    for i, L in enumerate(lengths):
        mask[i, :L] = True

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    enc = ConformerEncoder(dim=D, ffn_dim=FF, heads=H, layers=LAYERS,
                           dropout=0.0, attention_dropout=0.0, positional_dropout=0.0,
                           conv_kernel=7)
    variables = transplant(tm)
    out, _ = enc.apply(variables, jnp.asarray(x), jnp.asarray(mask), train=False)
    out = np.asarray(out)

    # compare only valid positions (masked tails may differ in conv leakage)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(out[i, :L], ref[i, :L], atol=2e-4,
                                   err_msg=f"row {i}")
