"""Converter parity for the Auto-AVSR variant (frozen conformer frontend with
its own resnet3d, then the trainable trunk with folded proj_in)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.core.config import (  # noqa: E402
    ConformerConfig,
    FrontendConfig,
    MultiTargetConfig,
)
from lip2speech_tpu.convert import torch_to_jax as conv  # noqa: E402
from lip2speech_tpu.models.multi_target import MultiTargetModel  # noqa: E402

from ref_mirror import RefConformerModule, RefEspnetEncoder  # noqa: E402

D_FE, D_TR = 48, 64  # frontend encoder dim (768 in ref), trunk dim (512)


class RefAutoAVSRModel(tnn.Module):
    """Reference key layout: encoder.encoder = frontend conformer (with
    resnet3d), conformer.* = trainable trunk + heads + proj_in
    (model_auto_avsr.py:28-140)."""

    def __init__(self):
        super().__init__()
        enc = tnn.Module()
        # frontend conformer uses the reference's cnn_module_kernel=31
        enc.encoder = RefEspnetEncoder(D_FE, 96, 2, 2, 31, in_dim=512,
                                       with_frontend=True)
        self.encoder = enc
        self.conformer = RefConformerModule(d=D_TR, ff=128, h=4, layers=2,
                                            k=7, vocab=204)
        # the trunk's own frontend is unused in this variant
        del self.conformer.encoder.frontend
        self.conformer.proj_in = tnn.Linear(D_FE, D_TR)
        # trunk embed must be (D_TR -> D_TR) after proj_in
        self.conformer.encoder.embed = tnn.Sequential(tnn.Linear(D_TR, D_TR))
        # mel conv expects d+256 input channels — matches RefConformerModule(d=D_TR)

    def forward(self, video, mask, spk):
        x = self.encoder.encoder.frontend(video)               # (B, T, 512)
        x = self.encoder.encoder.forward_after_frontend(x, mask)  # frozen frontend enc
        x = x.repeat_interleave(2, dim=1)
        mask2 = mask.repeat_interleave(1, dim=1).repeat_interleave(2, dim=1)[:, :x.size(1)]
        x = self.conformer.proj_in(x)
        x = self.conformer.encoder.forward_after_frontend(x, mask2)
        spk_x = torch.cat([spk.unsqueeze(1).repeat(1, x.size(1), 1), x], dim=-1)
        mel = self.conformer.mel_proj(
            self.conformer.mel_conv(spk_x.transpose(1, 2)).transpose(1, 2))
        b, t, dd = mel.shape
        mel = mel.reshape(b, t, dd // 2, 2).transpose(-1, -2).reshape(b, t * 2, dd // 2)
        units = self.conformer.proj_out(x)
        return units, mel


def test_convert_auto_avsr_variant():
    torch.manual_seed(0)
    tm = RefAutoAVSRModel().eval()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(0)
    b, t = 1, 5
    video = rng.standard_normal((b, t, 40, 40), dtype=np.float32)
    mask = np.ones((b, t), bool)
    spk = rng.standard_normal((b, 256), dtype=np.float32)

    with torch.no_grad():
        ref_units, ref_mel = tm(torch.from_numpy(video)[:, None],
                                torch.from_numpy(mask), torch.from_numpy(spk))

    cfg = MultiTargetConfig(
        frontend=FrontendConfig(kind="auto_avsr", frozen=True,
                                encoder_dim=D_FE, encoder_heads=2,
                                encoder_ffn_dim=96, encoder_layers=2),
        conformer=ConformerConfig(dim=D_TR, ffn_dim=128, heads=4, layers=2,
                                  conv_kernel=7, input_dim=D_FE))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = conv.convert_multi_target(sd, cfg)
    model = MultiTargetModel(cfg)
    out = model.apply(variables, jnp.asarray(video)[..., None], jnp.asarray(mask),
                      jnp.asarray(spk), train=False)

    np.testing.assert_allclose(np.asarray(out["unit_logits"]),
                               ref_units.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["mel"]), ref_mel.numpy(), atol=5e-4)
