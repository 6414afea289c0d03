"""Torch mirrors with EXACT reference state-dict key layouts.

These re-derive the reference models' math from torch primitives with module
names chosen so `state_dict()` keys match the real checkpoints
(multi_target_lip2speech/model.py, espnet encoder, speech-resynthesis
models.py). Used to test the checkpoint converter numerically without the
actual published .pt files.
"""

import math

import torch
import torch.nn as tnn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


def swish(x):
    return x * torch.sigmoid(x)


# ---------------- espnet conformer internals ----------------


class RefRelMHA(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h, self.d_k = h, d // h
        self.linear_q = tnn.Linear(d, d)
        self.linear_k = tnn.Linear(d, d)
        self.linear_v = tnn.Linear(d, d)
        self.linear_out = tnn.Linear(d, d)
        self.linear_pos = tnn.Linear(d, d, bias=False)
        self.pos_bias_u = tnn.Parameter(torch.randn(h, d // h))
        self.pos_bias_v = tnn.Parameter(torch.randn(h, d // h))

    @staticmethod
    def rel_shift(x):
        zero_pad = torch.zeros((*x.size()[:3], 1), dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(*x.size()[:2], x.size(3) + 1, x.size(2))
        return x_padded[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]

    def forward(self, x, pos_emb, mask):
        b, t, d = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.d_k)
        k = self.linear_k(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(x).view(b, t, self.h, self.d_k).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, self.h, self.d_k).transpose(1, 2)
        q_u = (q + self.pos_bias_u).transpose(1, 2)
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        scores = (torch.matmul(q_u, k.transpose(-2, -1))
                  + self.rel_shift(torch.matmul(q_v, p.transpose(-2, -1)))) / math.sqrt(self.d_k)
        if mask is not None:
            m = mask[:, None, None, :].eq(0)
            scores = scores.masked_fill(m, torch.finfo(scores.dtype).min)
            attn = torch.softmax(scores, dim=-1).masked_fill(m, 0.0)
        else:
            attn = torch.softmax(scores, dim=-1)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, t, d)
        return self.linear_out(out)


class RefFFN(tnn.Module):
    def __init__(self, d, ff):
        super().__init__()
        self.w_1 = tnn.Linear(d, ff)
        self.w_2 = tnn.Linear(ff, d)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class RefConvModule(tnn.Module):
    def __init__(self, d, k):
        super().__init__()
        # reference spelling: pointwise_cov1/2 (espnet convolution.py)
        self.pointwise_cov1 = tnn.Conv1d(d, 2 * d, 1)
        self.depthwise_conv = tnn.Conv1d(d, d, k, padding=(k - 1) // 2, groups=d)
        self.norm = tnn.BatchNorm1d(d)
        self.pointwise_cov2 = tnn.Conv1d(d, d, 1)

    def forward(self, x):
        x = x.transpose(1, 2)
        x = F.glu(self.pointwise_cov1(x), dim=1)
        x = self.depthwise_conv(x)
        x = swish(self.norm(x))
        return self.pointwise_cov2(x).transpose(1, 2)


class RefEncoderLayer(tnn.Module):
    def __init__(self, d, ff, h, k):
        super().__init__()
        self.self_attn = RefRelMHA(d, h)
        self.feed_forward = RefFFN(d, ff)
        self.feed_forward_macaron = RefFFN(d, ff)
        self.conv_module = RefConvModule(d, k)
        ln = lambda: tnn.LayerNorm(d, eps=1e-12)  # noqa: E731
        self.norm_ff = ln()
        self.norm_mha = ln()
        self.norm_ff_macaron = ln()
        self.norm_conv = ln()
        self.norm_final = ln()

    def forward(self, x, pos_emb, mask):
        x = x + 0.5 * self.feed_forward_macaron(self.norm_ff_macaron(x))
        x = x + self.self_attn(self.norm_mha(x), pos_emb, mask)
        x = x + self.conv_module(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward(self.norm_ff(x))
        return self.norm_final(x)


class RefBasicBlock(tnn.Module):
    def __init__(self, inp, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inp != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = swish(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return swish(out + r)


class RefTrunk(tnn.Module):
    def __init__(self):
        super().__init__()
        inp = 64
        for s, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)], 1):
            blocks = []
            for b in range(2):
                blocks.append(RefBasicBlock(inp, planes, stride if b == 0 else 1))
                inp = planes
            setattr(self, f"layer{s}", tnn.Sequential(*blocks))

    def forward(self, x):
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x.mean(dim=(2, 3))


class RefFrontend(tnn.Module):
    """espnet Conv3dResNet layout: frontend3D Sequential + trunk."""

    def __init__(self):
        super().__init__()
        self.frontend3D = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64))
        self.trunk = RefTrunk()

    def forward(self, x):  # (B, 1, T, H, W)
        x = swish(self.frontend3D(x))
        x = F.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        b, c, t, h, w = x.shape
        x = x.transpose(1, 2).reshape(b * t, c, h, w)
        x = self.trunk(x)
        return x.view(b, t, -1)


class RefEspnetEncoder(tnn.Module):
    def __init__(self, d, ff, h, layers, k, in_dim=512, with_frontend=True):
        super().__init__()
        self.d = d
        if with_frontend:
            self.frontend = RefFrontend()
        self.embed = tnn.Sequential(tnn.Linear(in_dim, d))
        self.encoders = tnn.ModuleList([RefEncoderLayer(d, ff, h, k) for _ in range(layers)])
        self.after_norm = tnn.LayerNorm(d, eps=1e-12)

    def rel_pe(self, t):
        pe_pos = torch.zeros(t, self.d)
        pe_neg = torch.zeros(t, self.d)
        position = torch.arange(0, t, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(torch.arange(0, self.d, 2, dtype=torch.float32)
                        * -(math.log(10000.0) / self.d))
        pe_pos[:, 0::2] = torch.sin(position * div)
        pe_pos[:, 1::2] = torch.cos(position * div)
        pe_neg[:, 0::2] = torch.sin(-position * div)
        pe_neg[:, 1::2] = torch.cos(-position * div)
        return torch.cat([torch.flip(pe_pos, [0]), pe_neg[1:]], dim=0).unsqueeze(0)

    def forward_after_frontend(self, x, mask):
        x = self.embed[0](x) * math.sqrt(self.d)
        pos = self.rel_pe(x.size(1))
        for layer in self.encoders:
            x = layer(x, pos, mask)
        return self.after_norm(x)


class RefMLP(tnn.Module):
    def __init__(self, d, out):
        super().__init__()
        self.projection = tnn.Sequential(
            tnn.Linear(d, d), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(d, d), tnn.GELU(), tnn.Dropout(0.0))
        self.last_layer = tnn.Linear(d, out)

    def forward(self, x):
        return self.last_layer(self.projection(x))


class RefConformerModule(tnn.Module):
    """Reference Conformer head module (model.py:105-228), conformer-only."""

    def __init__(self, d=64, ff=128, h=4, layers=2, k=7, vocab=204):
        super().__init__()
        self.encoder = RefEspnetEncoder(d, ff, h, layers, k)
        self.proj_out = RefMLP(d, vocab)
        self.mel_conv = tnn.Sequential(
            tnn.Conv1d(d + 256, d, 3, 1, 1), tnn.Dropout(0.0), tnn.GELU(),
            tnn.Conv1d(d, d, 3, 1, 1), tnn.Dropout(0.0), tnn.GELU(),
            tnn.Conv1d(d, d, 3, 1, 1), tnn.Dropout(0.0), tnn.GELU())
        self.mel_proj = tnn.Linear(d, 160)

    def forward(self, video, padding_mask, spk_emb):
        x = self.encoder.frontend(video)
        x = x.repeat_interleave(2, dim=1)
        mask = padding_mask.repeat_interleave(2, dim=1)
        x = self.encoder.forward_after_frontend(x, mask)
        spk_x = torch.cat([spk_emb.unsqueeze(1).repeat(1, x.size(1), 1), x], dim=-1)
        mel = self.mel_proj(self.mel_conv(spk_x.transpose(1, 2)).transpose(1, 2))
        b, t, dd = mel.shape
        mel = mel.reshape(b, t, dd // 2, 2).transpose(-1, -2).reshape(b, t * 2, dd // 2)
        units = self.proj_out(x)
        return units, mel, mask


class RefMultiTarget(tnn.Module):
    """Top-level: FairseqEncoderModel stores the Conformer as .encoder."""

    def __init__(self, **kw):
        super().__init__()
        self.encoder = RefConformerModule(**kw)

    def forward(self, video, padding_mask, spk_emb):
        return self.encoder(video, padding_mask, spk_emb)


# ---------------- vocoder reference layout ----------------


def get_padding(k, d=1):
    return (k * d - d) // 2


class RefResBlock(tnn.Module):
    def __init__(self, ch, k, dils=(1, 3, 5)):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=get_padding(k, d)))
             for d in dils])
        self.convs2 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, padding=get_padding(k))) for _ in dils])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
            x = xt + x
        return x


class RefMelCodeGenerator(tnn.Module):
    """Exact reference key layout: dict/layer/fc/spkr at top level + HiFi-GAN
    fields (conv_pre/ups/resblocks/conv_post) flat on the same module."""

    def __init__(self, h):
        super().__init__()
        self.dict = tnn.Embedding(h.num_embeddings, h.embedding_dim)
        self.layer = tnn.Sequential(
            tnn.ConvTranspose1d(h.embedding_dim, h.embedding_dim, 4, 2, 1), tnn.GELU())
        self.fc = tnn.Linear(h.embedding_dim, h.embedding_dim)
        self.spkr = tnn.Linear(h.embedder_dim, h.embedding_dim)
        self.num_kernels = len(h.resblock_kernel_sizes)
        self.conv_pre = weight_norm(
            tnn.Conv1d(h.model_in_dim, h.upsample_initial_channel, 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            cin = h.upsample_initial_channel // (2 ** i)
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(weight_norm(tnn.ConvTranspose1d(cin, ch, k, u, padding=(k - u) // 2)))
            for rk, rd in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
                self.resblocks.append(RefResBlock(ch, rk, rd))
        self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, code, mel, spk):
        c = self.dict(code)
        c = self.layer(c.permute(0, 2, 1)).permute(0, 2, 1)
        c = self.fc(c).permute(0, 2, 1)
        x = torch.cat([mel, c], dim=1)
        s = self.spkr(spk).unsqueeze(-1).repeat(1, 1, x.shape[-1])
        x = torch.cat([x, s], dim=1)
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = self.ups[i](F.leaky_relu(x, 0.1))
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        return torch.tanh(self.conv_post(F.leaky_relu(x)))
