"""Converter parity for the AV-HuBERT video encoder (reference key layout)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.convert import torch_to_jax as conv  # noqa: E402
from lip2speech_tpu.models.avhubert import AVHubertVideoEncoder  # noqa: E402

D, H, FF, LAYERS = 32, 2, 64, 2


def act(ch):
    return tnn.PReLU(num_parameters=ch)


class TorchResEncoder(tnn.Module):
    """avhubert/resnet.py ResEncoder key layout (frontend3D + trunk)."""

    def __init__(self):
        super().__init__()
        self.frontend3D = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64), act(64),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)))

        class Block(tnn.Module):
            def __init__(self, inp, planes, stride):
                super().__init__()
                self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.relu1 = act(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.relu2 = act(planes)
                self.downsample = None
                if stride != 1 or inp != planes:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(inp, planes, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes))

            def forward(self, x):
                r = x if self.downsample is None else self.downsample(x)
                out = self.relu1(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                return self.relu2(out + r)

        class Trunk(tnn.Module):
            def __init__(self):
                super().__init__()
                inp = 64
                for s, (pl, st) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)], 1):
                    blocks = []
                    for b in range(2):
                        blocks.append(Block(inp, pl, st if b == 0 else 1))
                        inp = pl
                    setattr(self, f"layer{s}", tnn.Sequential(*blocks))

            def forward(self, x):
                for s in range(1, 5):
                    x = getattr(self, f"layer{s}")(x)
                return x.mean(dim=(2, 3))

        self.trunk = Trunk()

    def forward(self, x):  # (B, 1, T, H, W) -> (B, T, 512)
        x = self.frontend3D(x)
        b, c, t, h, w = x.shape
        x = x.transpose(1, 2).reshape(b * t, c, h, w)
        x = self.trunk(x)
        return x.view(b, t, -1)


class TorchW2V2Layer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = tnn.Module()
        self.self_attn.q_proj = tnn.Linear(D, D)
        self.self_attn.k_proj = tnn.Linear(D, D)
        self.self_attn.v_proj = tnn.Linear(D, D)
        self.self_attn.out_proj = tnn.Linear(D, D)
        self.self_attn_layer_norm = tnn.LayerNorm(D)
        self.fc1 = tnn.Linear(D, FF)
        self.fc2 = tnn.Linear(FF, D)
        self.final_layer_norm = tnn.LayerNorm(D)

    def attn(self, x):
        b, t, d = x.shape
        dk = d // H
        q = self.self_attn.q_proj(x).view(b, t, H, dk)
        k = self.self_attn.k_proj(x).view(b, t, H, dk)
        v = self.self_attn.v_proj(x).view(b, t, H, dk)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / (dk ** 0.5)
        p = torch.softmax(s, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        return self.self_attn.out_proj(o)

    def forward(self, x):  # pre-norm (layer_norm_first=True, like large_vox)
        x = x + self.attn(self.self_attn_layer_norm(x))
        y = self.final_layer_norm(x)
        return x + self.fc2(F.gelu(self.fc1(y)))


class TorchAVHubert(tnn.Module):
    """AVHubertModel key layout for the video-only path."""

    def __init__(self):
        super().__init__()
        fe = tnn.Module()
        fe.resnet = TorchResEncoder()
        fe.proj = tnn.Linear(512, D)
        self.feature_extractor_video = fe
        self.layer_norm = tnn.LayerNorm(2 * D)
        self.post_extract_proj = tnn.Linear(2 * D, D)
        enc = tnn.Module()
        pc = tnn.Conv1d(D, D, 128, padding=64, groups=16)
        enc.pos_conv = tnn.Sequential(weight_norm(pc, name="weight", dim=2), tnn.GELU())
        enc.layers = tnn.ModuleList([TorchW2V2Layer() for _ in range(LAYERS)])
        enc.layer_norm = tnn.LayerNorm(D)
        self.encoder = enc

    def forward(self, video):  # (B, 1, T, H, W)
        feats = self.feature_extractor_video.resnet(video)
        feats = self.feature_extractor_video.proj(feats)
        fused = torch.cat([torch.zeros_like(feats), feats], dim=-1)
        fused = self.layer_norm(fused)
        x = self.post_extract_proj(fused)
        x = x + self.encoder.pos_conv(x.transpose(1, 2)).transpose(1, 2)[:, : x.size(1)]
        for lyr in self.encoder.layers:
            x = lyr(x)
        return self.encoder.layer_norm(x)


def test_avhubert_video_encoder_conversion():
    torch.manual_seed(0)
    tm = TorchAVHubert().eval()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(0)
    video = rng.standard_normal((1, 5, 40, 40), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(video)[:, None]).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = conv.convert_avhubert_video_encoder(sd, "", n_layers=LAYERS)

    model = AVHubertVideoEncoder(dim=D, heads=H, ffn_dim=FF, layers=LAYERS,
                                 layer_norm_first=True)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(video)[..., None], train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)
