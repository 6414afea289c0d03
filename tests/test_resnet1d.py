"""Conv1D audio frontend parity vs torch mirror."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.models.resnet1d import Conv1dResNetFrontend  # noqa: E402


class TorchBlock(tnn.Module):
    def __init__(self, inp, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv1d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm1d(planes)
        self.conv2 = tnn.Conv1d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm1d(planes)
        self.down = None
        if stride != 1 or inp != planes:
            self.down = tnn.Sequential(tnn.Conv1d(inp, planes, 1, stride, bias=False),
                                       tnn.BatchNorm1d(planes))

    def forward(self, x):
        sw = lambda v: v * torch.sigmoid(v)  # noqa: E731
        r = x if self.down is None else self.down(x)
        out = sw(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return sw(out + r)


class TorchConv1dResNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv1d(1, 64, 80, 4, 38, bias=False)
        self.bn1 = tnn.BatchNorm1d(64)
        blocks = []
        inp = 64
        for planes, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
            for b in range(2):
                blocks.append(TorchBlock(inp, planes, stride if b == 0 else 1))
                inp = planes
        self.blocks = tnn.ModuleList(blocks)
        self.avgpool = tnn.AvgPool1d(20, 20)

    def forward(self, x):  # (B, 1, T)
        t = x.shape[-1]
        x = x[..., : t // 640 * 640]
        sw = lambda v: v * torch.sigmoid(v)  # noqa: E731
        x = sw(self.bn1(self.conv1(x)))
        for b in self.blocks:
            x = b(x)
        return self.avgpool(x)


def test_conv1d_frontend_parity():
    torch.manual_seed(0)
    tm = TorchConv1dResNet().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 1, 3300), dtype=np.float32) * 0.1
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav)).transpose(1, 2).numpy()  # (B, T, C)

    model = Conv1dResNetFrontend()

    def _c(m):
        return {"weight": m.weight.detach().numpy().transpose(2, 1, 0)}

    def _b(m):
        return ({"weight": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()},
                {"running_mean": m.running_mean.numpy(), "running_var": m.running_var.numpy()})

    params = {"stem_conv": _c(tm.conv1)}
    stats = {}
    params["stem_bn"], stats["stem_bn"] = _b(tm.bn1)
    idx = 0
    for stage in range(1, 5):
        for b in range(2):
            blk = tm.blocks[idx]
            idx += 1
            name = f"trunk_layer{stage}_{b}"
            p = {"conv1": _c(blk.conv1), "conv2": _c(blk.conv2)}
            s = {}
            p["bn1"], s["bn1"] = _b(blk.bn1)
            p["bn2"], s["bn2"] = _b(blk.bn2)
            if blk.down is not None:
                p["downsample_conv"] = _c(blk.down[0])
                p["downsample_bn"], s["downsample_bn"] = _b(blk.down[1])
            params[name] = p
            stats[name] = s

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(wav.transpose(0, 2, 1)), train=False)
    # 3300 -> 3200 samples -> /640 = 5 frames at 25 Hz
    assert out.shape == (1, 5, 512)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)
