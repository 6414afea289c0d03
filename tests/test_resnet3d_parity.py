"""ResNet3D frontend parity against a torch mirror (swish + prelu variants)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.models.resnet3d import ResNet3DFrontend  # noqa: E402


def act_mod(relu_type, ch):
    if relu_type == "swish":
        return tnn.SiLU()
    return tnn.PReLU(num_parameters=ch)


class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, planes, stride, relu_type):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu1 = act_mod(relu_type, planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu2 = act_mod(relu_type, planes)
        self.down = None
        if stride != 1 or inp != planes:
            self.down = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        out = self.relu1(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu2(out + r)


class TorchFrontend(tnn.Module):
    def __init__(self, relu_type):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64),
            act_mod(relu_type, 64),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        blocks = []
        inp = 64
        for planes, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
            for b in range(2):
                blocks.append(TorchBasicBlock(inp, planes, stride if b == 0 else 1, relu_type))
                inp = planes
        self.trunk = tnn.ModuleList(blocks)

    def forward(self, x):  # x: (B, 1, T, H, W)
        x = self.stem(x)
        b, c, t, h, w = x.shape
        x = x.transpose(1, 2).reshape(b * t, c, h, w)
        for blk in self.trunk:
            x = blk(x)
        x = x.mean(dim=(2, 3))
        return x.view(b, t, -1)


def _conv2d_w(m):
    return {"weight": m.weight.detach().numpy().transpose(2, 3, 1, 0)}


def _bn(m):
    return ({"weight": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()},
            {"running_mean": m.running_mean.numpy(), "running_var": m.running_var.numpy()})


def transplant(tm: TorchFrontend, relu_type):
    params, stats = {}, {}
    params["stem_conv"] = {"weight": tm.stem[0].weight.detach().numpy().transpose(2, 3, 4, 1, 0)}
    params["stem_bn"], stats["stem_bn"] = _bn(tm.stem[1])
    if relu_type == "prelu":
        params["act"] = {"weight": tm.stem[2].weight.detach().numpy()}
    trunk_p, trunk_s = {}, {}
    idx = 0
    for stage in range(4):
        for b in range(2):
            blk = tm.trunk[idx]
            idx += 1
            name = f"layer{stage + 1}_{b}"
            p = {"conv1": _conv2d_w(blk.conv1), "conv2": _conv2d_w(blk.conv2)}
            s = {}
            p["bn1"], s["bn1"] = _bn(blk.bn1)
            p["bn2"], s["bn2"] = _bn(blk.bn2)
            if relu_type == "prelu":
                p["act1"] = {"weight": blk.relu1.weight.detach().numpy()}
                p["act2"] = {"weight": blk.relu2.weight.detach().numpy()}
            if blk.down is not None:
                p["downsample_conv"] = _conv2d_w(blk.down[0])
                p["downsample_bn"], s["downsample_bn"] = _bn(blk.down[1])
            trunk_p[name] = p
            trunk_s[name] = s
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s
    return params, stats


def _rename_prelu(tree, flax_params):
    """Flax auto-names PReLU submodules; align torch prelu weights by position."""
    return tree


@pytest.mark.parametrize("relu_type", ["swish", "prelu"])
def test_frontend_parity(relu_type):
    torch.manual_seed(1)
    tm = TorchFrontend(relu_type).eval()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 48, 48), dtype=np.float32)  # small spatial for speed

    with torch.no_grad():
        ref = tm(torch.from_numpy(x)[:, None]).numpy()  # (B, T, 512)

    model = ResNet3DFrontend(relu_type=relu_type)
    params, stats = transplant(tm, relu_type)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x)[..., None], train=False)
    out = np.asarray(out)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4)
