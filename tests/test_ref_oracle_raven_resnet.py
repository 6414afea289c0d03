"""Parity vs the REAL RAVEn encoder and the REAL AV-HuBERT ResEncoder.

Oracles:
  raven/_espnet/nets/pytorch_backend/transformer/encoder.py::Encoder with the
  stage-1 RAVEn flags (model_raven.py:107-132: vanilla_linear, no macaron,
  no conv module, layerscale, ff_bn_pre BatchNorm pre-norms, post_norm=False,
  drop_path) — imported as a package (no fairseq dependency).
  avhubert/resnet.py::ResEncoder (PReLU 3D-conv + ResNet-18) — loaded as a
  single file, bypassing the fairseq-importing avhubert/__init__.py.
"""

import numpy as np

import jax.numpy as jnp

import ref_oracle

from lip2speech_tpu.convert.torch_to_jax import (
    _lin,
    _ln,
    convert_conformer_layers,
    convert_resnet3d,
)
from lip2speech_tpu.models.conformer import ConformerEncoder
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend

IDIM, ADIM, HEADS, FF, LAYERS = 48, 64, 4, 128, 2
B, T = 2, 7


def test_raven_encoder_vs_reference():
    torch = ref_oracle.require_ref()
    Encoder = ref_oracle.raven_encoder_cls()
    torch.manual_seed(0)
    enc = Encoder(
        idim=IDIM,
        attention_dim=ADIM,
        attention_heads=HEADS,
        linear_units=FF,
        num_blocks=LAYERS,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        frontend=None,
        input_layer="vanilla_linear",
        macaron_style=False,
        encoder_attn_layer_type="rel_mha",
        use_cnn_module=False,
        layerscale=True,
        init_values=0.1,
        ff_bn_pre=True,
        post_norm=False,
        drop_path=0.1,
    ).eval()
    # make layerscale gammas and BN stats non-trivial
    with torch.no_grad():
        for mod in enc.modules():
            if hasattr(mod, "running_mean"):
                mod.running_mean.normal_()
                mod.running_var.uniform_(0.5, 2.0)
            for name in ("gamma_ff", "gamma_mha"):
                if hasattr(mod, name):
                    getattr(mod, name).normal_(0.1, 0.02)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, T, IDIM), dtype=np.float32)
    lengths = [T, T - 3]
    mask = np.zeros((B, T), bool)
    for i, L in enumerate(lengths):
        mask[i, :L] = True

    with torch.no_grad():
        ref, _ = enc(torch.from_numpy(x), torch.from_numpy(mask[:, None, :]))
    ref = ref.numpy()

    sd = ref_oracle.state_dict_numpy(enc)
    params, stats = convert_conformer_layers(
        sd, "", LAYERS, macaron=False, use_conv=False,
        layerscale=True, ff_bn_pre=True)
    params["embed"] = _lin(sd, "embed.0")
    params["after_norm"] = _ln(sd, "after_norm")

    flax_enc = ConformerEncoder(
        dim=ADIM, ffn_dim=FF, heads=HEADS, layers=LAYERS,
        dropout=0.0, attention_dropout=0.0, positional_dropout=0.0,
        macaron=False, use_conv=False, layerscale=True, init_values=0.1,
        ff_bn_pre=True, drop_path=0.1,
    )
    out, _ = flax_enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(mask), train=False,
    )
    out = np.asarray(out)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(out[i, :L], ref[i, :L], atol=3e-4,
                                   err_msg=f"row {i}")


def test_avhubert_resencoder_vs_reference():
    torch = ref_oracle.require_ref()
    resnet_mod = ref_oracle.avhubert_resnet()
    torch.manual_seed(1)
    enc = resnet_mod.ResEncoder(relu_type="prelu", weights=None).eval()
    with torch.no_grad():
        for mod in enc.modules():
            if hasattr(mod, "running_mean"):
                mod.running_mean.normal_()
                mod.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(5)
    video = rng.standard_normal((B, 1, T, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(video)).numpy()       # (B, 512, T)

    sd = ref_oracle.state_dict_numpy(enc)
    params, stats = convert_resnet3d(sd, "", prelu=True)
    out = ResNet3DFrontend(relu_type="prelu").apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), atol=5e-4)
