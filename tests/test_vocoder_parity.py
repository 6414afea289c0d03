"""Parity of the multi-input HiFi-GAN against a small torch mirror."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.core.config import VocoderConfig  # noqa: E402
from lip2speech_tpu.models import vocoder as voc  # noqa: E402

# small config: 2 upsample stages (4x total), 2 resblock kernels, tiny channels
CFG = VocoderConfig(
    model_in_dim=20,
    num_embeddings=16,
    embedding_dim=8,
    embedder_dim=12,
    upsample_initial_channel=16,
    upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
)


def get_padding(k, d=1):
    return (k * d - d) // 2


class TorchResBlock(tnn.Module):
    def __init__(self, ch, k, dils=(1, 3, 5)):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=get_padding(k, d)))
             for d in dils])
        self.convs2 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, dilation=1, padding=get_padding(k, 1)))
             for _ in dils])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class TorchGenerator(tnn.Module):
    def __init__(self, h):
        super().__init__()
        self.num_kernels = len(h.resblock_kernel_sizes)
        self.conv_pre = weight_norm(tnn.Conv1d(h.model_in_dim, h.upsample_initial_channel, 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            cin = h.upsample_initial_channel // (2 ** i)
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(weight_norm(tnn.ConvTranspose1d(cin, ch, k, u, padding=(k - u) // 2)))
            for rk, rd in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock(ch, rk, rd))
        self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


class TorchMelCode(tnn.Module):
    def __init__(self, h):
        super().__init__()
        self.dict = tnn.Embedding(h.num_embeddings, h.embedding_dim)
        self.layer = tnn.Sequential(
            tnn.ConvTranspose1d(h.embedding_dim, h.embedding_dim, 4, 2, 1), tnn.GELU())
        self.fc = tnn.Linear(h.embedding_dim, h.embedding_dim)
        self.spkr = tnn.Linear(h.embedder_dim, h.embedding_dim)
        self.generator = TorchGenerator(h)

    def forward(self, code, mel, spk):
        c = self.dict(code)
        c = self.layer(c.permute(0, 2, 1)).permute(0, 2, 1)
        c = self.fc(c).permute(0, 2, 1)  # (B, E, 2Tc)
        x = torch.cat([mel, c], dim=1)
        s = self.spkr(spk).unsqueeze(-1).repeat(1, 1, x.shape[-1])
        x = torch.cat([x, s], dim=1)
        return self.generator(x)


def _wn_conv1d(m):
    v = m.weight_v.detach().numpy().transpose(2, 1, 0)
    g = m.weight_g.detach().numpy().reshape(-1)
    return {"weight_v": v, "weight_g": g, "bias": m.bias.detach().numpy()}


def _wn_convT1d(m):
    # torch convtranspose weight (in, out, k) with g per-in-channel (dim=0);
    # ours stored (K, O, I) with g on the last axis
    v = m.weight_v.detach().numpy().transpose(2, 1, 0)
    g = m.weight_g.detach().numpy().reshape(-1)
    return {"weight_v": v, "weight_g": g, "bias": m.bias.detach().numpy()}


def _lin(m):
    return {"weight": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def transplant(tm: TorchMelCode, h):
    gen = {"conv_pre": _wn_conv1d(tm.generator.conv_pre),
           "conv_post": _wn_conv1d(tm.generator.conv_post)}
    for i, up in enumerate(tm.generator.ups):
        gen[f"ups_{i}"] = _wn_convT1d(up)
    for i, rb in enumerate(tm.generator.resblocks):
        p = {}
        for j, c in enumerate(rb.convs1):
            p[f"convs1_{j}"] = _wn_conv1d(c)
        for j, c in enumerate(rb.convs2):
            p[f"convs2_{j}"] = _wn_conv1d(c)
        gen[f"resblocks_{i}"] = p
    # code_upsample is a plain (non-WN) ConvTranspose1d in torch; ours is WN.
    # fold: v = w, g = ||w|| per in-channel -> composed weight equals w.
    w = tm.layer[0].weight.detach().numpy().transpose(2, 1, 0)  # (K, O, I)
    g = np.sqrt((w ** 2).sum(axis=(0, 1)))
    params = {
        "dict": {"embedding": tm.dict.weight.detach().numpy()},
        "code_upsample": {"weight_v": w, "weight_g": g,
                          "bias": tm.layer[0].bias.detach().numpy()},
        "code_fc": _lin(tm.fc),
        "spkr": _lin(tm.spkr),
        "generator": gen,
    }
    return {"params": params}


def test_melcode_generator_parity():
    torch.manual_seed(0)
    tm = TorchMelCode(CFG).eval()
    rng = np.random.default_rng(5)
    tc = 6
    code = rng.integers(0, CFG.num_embeddings, (2, tc)).astype(np.int32)
    mel = rng.standard_normal((2, 80, 2 * tc), dtype=np.float32)[:, :CFG.model_in_dim - 2 * CFG.embedding_dim]
    spk = rng.standard_normal((2, CFG.embedder_dim), dtype=np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(code).long(), torch.from_numpy(mel),
                 torch.from_numpy(spk)).numpy()[:, 0]

    model = voc.MelCodeGenerator(CFG)
    variables = transplant(tm, CFG)
    out = model.apply(variables, jnp.asarray(code), jnp.asarray(mel.transpose(0, 2, 1)),
                      jnp.asarray(spk), deterministic=True)
    out = np.asarray(out)
    assert out.shape == ref.shape  # (B, 4*tc*... ) total upsample x 2Tc
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_discriminators_run_and_losses():
    rng = np.random.default_rng(9)
    y = jnp.asarray(rng.standard_normal((2, 480), dtype=np.float32))
    yh = jnp.asarray(rng.standard_normal((2, 480), dtype=np.float32))

    mpd = voc.MultiPeriodDiscriminator()
    vars_p = mpd.init(jax.random.PRNGKey(0), y, yh, train=False)
    rs, gs, fr, fg = mpd.apply(vars_p, y, yh, train=False)
    assert len(rs) == 5 and len(fr[0]) == 6

    msd = voc.MultiScaleDiscriminator()
    vars_s = msd.init(jax.random.PRNGKey(1), y, yh, train=False)
    rs2, gs2, fr2, fg2 = msd.apply(vars_s, y, yh, train=False)
    assert len(rs2) == 3 and len(fr2[0]) == 8

    dl = voc.discriminator_loss(rs, gs)
    fl = voc.feature_loss(fr, fg)
    gl = voc.generator_adv_loss(gs)
    assert np.isfinite(float(dl)) and np.isfinite(float(fl)) and np.isfinite(float(gl))

    # spectral-norm power iteration updates state in train mode
    out, mutated = msd.apply(vars_s, y, yh, train=True, mutable=["spectral"])
    assert "spectral" in mutated


def test_period_discriminator_matches_torch():
    """DiscriminatorP (one period) vs torch mirror."""
    period = 3

    class TorchDiscP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convs = tnn.ModuleList([
                weight_norm(tnn.Conv2d(1, 32, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(32, 128, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(128, 512, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(512, 1024, (5, 1), (3, 1), padding=(2, 0))),
                weight_norm(tnn.Conv2d(1024, 1024, (5, 1), 1, padding=(2, 0))),
            ])
            self.conv_post = weight_norm(tnn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))

        def forward(self, x):
            b, c, t = x.shape
            if t % period:
                x = F.pad(x, (0, period - t % period), "reflect")
                t = x.shape[-1]
            x = x.view(b, c, t // period, period)
            for conv in self.convs:
                x = F.leaky_relu(conv(x), 0.1)
            x = self.conv_post(x)
            return torch.flatten(x, 1, -1)

    torch.manual_seed(2)
    tm = TorchDiscP().eval()
    rng = np.random.default_rng(11)
    y = rng.standard_normal((1, 100), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(y)[:, None]).numpy()

    def _wn2(m):
        return {"weight_v": m.weight_v.detach().numpy().transpose(2, 3, 1, 0),
                "weight_g": m.weight_g.detach().numpy().reshape(-1),
                "bias": m.bias.detach().numpy()}

    params = {f"convs_{i}": _wn2(c) for i, c in enumerate(tm.convs)}
    params["conv_post"] = _wn2(tm.conv_post)

    d = voc.DiscriminatorP(period)
    out, _ = d.apply({"params": params}, jnp.asarray(y), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
