"""Forward-shape tests for all four stage-1 encoder variants (tiny dims)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lip2speech_tpu.core.config import (
    ConformerConfig,
    FrontendConfig,
    MultiTargetConfig,
    preset,
)
from lip2speech_tpu.models.multi_target import MultiTargetModel


def _tiny(kind: str) -> MultiTargetConfig:
    fe = FrontendConfig(kind=kind, frozen=kind != "resnet3d",
                        encoder_dim=48, encoder_heads=2,
                        encoder_ffn_dim=96, encoder_layers=2)
    return MultiTargetConfig(
        frontend=fe,
        conformer=ConformerConfig(dim=32, ffn_dim=64, heads=2, layers=1,
                                  input_dim=512 if kind == "resnet3d" else 48))


@pytest.mark.parametrize("kind", ["resnet3d", "avhubert", "auto_avsr", "raven"])
def test_variant_forward(kind):
    cfg = _tiny(kind)
    model = MultiTargetModel(cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((1, 6, 32, 32, 1)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], bool))
    spk = jnp.zeros((1, 256))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, video, mask, spk, train=False)
    out = model.apply(variables, video, mask, spk, train=False)
    assert out["unit_logits"].shape == (1, 12, 204)
    assert out["mel"].shape == (1, 24, 80)
    assert out["mask"].shape == (1, 12)
    assert bool(out["mask"][0, 7]) is True and bool(out["mask"][0, 8]) is False

    # dropout/drop-path rng path in train mode
    out_t, _ = model.apply(variables, video, mask, spk, train=True,
                           rngs={"dropout": key}, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out_t["unit_logits"])).all()


def test_presets_match_reference_dims():
    av = preset("multi_target_avhubert")
    assert av.model.frontend.encoder_dim == 1024      # AV-HuBERT large
    assert av.model.frontend.encoder_layers == 24
    assert av.model.conformer.input_dim == 1024
    aa = preset("multi_target_auto_avsr")
    assert aa.model.frontend.encoder_dim == 768       # Auto-AVSR conformer
    assert aa.model.frontend.encoder_layers == 12
    rv = preset("multi_target_raven")
    assert rv.model.frontend.encoder_dim == 1024      # RAVEn transformer
    assert rv.model.frontend.encoder_layers == 24
    base = preset("multi_target")
    assert base.model.conformer.dim == 512
    assert base.model.units.vocab_size == 204
