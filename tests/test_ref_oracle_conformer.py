"""Parity vs the REAL reference ESPnet conformer Encoder.

Oracle: espnet/nets/pytorch_backend/transformer/encoder.py::Encoder from
/root/reference, instantiated with the stage-1 architecture flags
(multi_target_lip2speech/model.py:109-125: conv3d frontend, macaron,
rel_mha, cnn module, swish), its random state_dict() run through our
converter, and outputs compared against the flax models. Unlike
tests/test_conformer_parity.py (a torch mirror re-deriving the math), this
grades the implementation against the reference's own code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_oracle

from lip2speech_tpu.convert.torch_to_jax import (
    convert_espnet_encoder,
    convert_resnet3d,
)
from lip2speech_tpu.models.conformer import ConformerEncoder
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend

ADIM, HEADS, FF, LAYERS = 64, 4, 128, 2
B, T = 2, 7


def _build_ref_encoder(torch, input_layer):
    Encoder = ref_oracle.espnet_encoder_cls()
    torch.manual_seed(0)
    enc = Encoder(
        idim=512,
        attention_dim=ADIM,
        attention_heads=HEADS,
        linear_units=FF,
        num_blocks=LAYERS,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        input_layer=input_layer,
        macaron_style=1,
        encoder_attn_layer_type="rel_mha",
        use_cnn_module=1,
        cnn_module_kernel=7,
        relu_type="swish",
    ).eval()
    # randomize BN running stats so eval-mode BN is actually exercised
    for m in enc.modules():
        if hasattr(m, "running_mean"):
            m.running_mean.normal_()
            m.running_var.uniform_(0.5, 2.0)
    return enc


def _masks(lengths, t):
    mask = np.zeros((len(lengths), t), bool)
    for i, L in enumerate(lengths):
        mask[i, :L] = True
    return mask


def test_forward_after_frontend_vs_reference():
    """embed Linear + conformer trunk + after_norm (encoder.py:285-306)."""
    torch = ref_oracle.require_ref()
    # conv3d branch: embed = Sequential(Linear(512, adim), pos_enc)
    # (encoder.py:155-159); forward_after_frontend skips the frontend.
    enc = _build_ref_encoder(torch, input_layer="conv3d")

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((B, T, 512), dtype=np.float32)
    lengths = [T, T - 3]
    mask = _masks(lengths, T)

    with torch.no_grad():
        ref, _ = enc.forward_after_frontend(
            torch.from_numpy(feats), torch.from_numpy(mask[:, None, :])
        )
    ref = ref.numpy()

    sd = ref_oracle.state_dict_numpy(enc)
    params, stats = convert_espnet_encoder(sd, "", LAYERS)
    flax_enc = ConformerEncoder(
        dim=ADIM, ffn_dim=FF, heads=HEADS, layers=LAYERS,
        dropout=0.0, attention_dropout=0.0, positional_dropout=0.0,
        conv_kernel=7,
    )
    out, _ = flax_enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats), jnp.asarray(mask), train=False,
    )
    out = np.asarray(out)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(out[i, :L], ref[i, :L], atol=3e-4,
                                   err_msg=f"row {i}")


def test_full_conv3d_encoder_vs_reference():
    """Frontend Conv3dResNet + trunk end to end (encoder.py:238-257)."""
    torch = ref_oracle.require_ref()
    enc = _build_ref_encoder(torch, input_layer="conv3d")

    rng = np.random.default_rng(2)
    video = rng.standard_normal((B, T, 32, 32), dtype=np.float32)
    lengths = [T, T - 2]
    mask = _masks(lengths, T)

    with torch.no_grad():
        ref, _ = enc(torch.from_numpy(video), torch.from_numpy(mask[:, None, :]))
    ref = ref.numpy()

    sd = ref_oracle.state_dict_numpy(enc)
    fe_p, fe_s = convert_resnet3d(sd, "frontend.", prelu=False)
    conf_p, conf_s = convert_espnet_encoder(sd, "", LAYERS)

    frontend = ResNet3DFrontend(relu_type="swish")
    feats = frontend.apply(
        {"params": fe_p, "batch_stats": fe_s},
        jnp.asarray(video[..., None]), train=False,
    )

    flax_enc = ConformerEncoder(
        dim=ADIM, ffn_dim=FF, heads=HEADS, layers=LAYERS,
        dropout=0.0, attention_dropout=0.0, positional_dropout=0.0,
        conv_kernel=7,
    )
    out, _ = flax_enc.apply(
        {"params": conf_p, "batch_stats": conf_s},
        feats, jnp.asarray(mask), train=False,
    )
    out = np.asarray(out)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(out[i, :L], ref[i, :L], atol=1e-3,
                                   err_msg=f"row {i}")


def test_resnet_feature_extraction_vs_reference():
    """extract_resnet_feats short-circuit == our frontend alone (encoder.py:241)."""
    torch = ref_oracle.require_ref()
    enc = _build_ref_encoder(torch, input_layer="conv3d")

    rng = np.random.default_rng(3)
    video = rng.standard_normal((B, T, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(video), None, extract_resnet_feats=True).numpy()

    sd = ref_oracle.state_dict_numpy(enc)
    fe_p, fe_s = convert_resnet3d(sd, "frontend.", prelu=False)
    feats = ResNet3DFrontend(relu_type="swish").apply(
        {"params": fe_p, "batch_stats": fe_s},
        jnp.asarray(video[..., None]), train=False,
    )
    np.testing.assert_allclose(np.asarray(feats), ref, atol=5e-4)
