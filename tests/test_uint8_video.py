"""uint8 wire-format video path (NOTES r3: the train step is host->device
bandwidth-bound; shipping uint8 + on-device normalization cuts the transfer
4x). Must be numerically identical to the host-f32 path for real pixels."""

import numpy as np

import jax
import jax.numpy as jnp

from lip2speech_tpu.core.config import ConformerConfig, preset, with_overrides
from lip2speech_tpu.data.stage1 import Stage1Dataset
from lip2speech_tpu.data.transforms import UINT8_FILL, prepare_video
from lip2speech_tpu.ops.nn import dequantize_video
from lip2speech_tpu.train import stage1

ROOT = "/root/reference/datasets/lrs3"


def test_dequantize_matches_host_normalization():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (6, 96, 96), dtype=np.uint8)
    f32 = prepare_video(frames, 88, train=False)
    u8 = prepare_video(frames, 88, train=False, emit_uint8=True)
    assert u8.dtype == np.uint8
    deq = np.asarray(dequantize_video(jnp.asarray(u8)))
    np.testing.assert_allclose(deq, f32, atol=1e-6)
    # float input passes through unchanged
    np.testing.assert_array_equal(
        np.asarray(dequantize_video(jnp.asarray(f32))), f32)


def test_uint8_fill_is_near_zero_normalized():
    deq = float(np.asarray(dequantize_video(
        jnp.full((1, 1, 1, 1, 1), UINT8_FILL, jnp.uint8))))
    assert abs(deq) < 0.01  # pad/erase fill ~ normalized 0


def test_uint8_train_step_matches_f32(lrs3_sample_dir):
    """One train step on real data: identical loss from the uint8 and f32
    batch formats (eval-mode transforms => no erase, exact equality regime)."""
    cfg = preset("multi_target")
    cfg = with_overrides(cfg, {
        "model.conformer": ConformerConfig(dim=32, ffn_dim=64, heads=2,
                                           layers=1, input_dim=512),
        "stage1.update_freq": 1, "stage1.batch_size": 2,
        "stage1.max_updates": 2, "stage1.warmup_updates": 1,
    })
    kw = dict(root_override=ROOT, train=False, max_frames=12)
    ds_f = Stage1Dataset(f"{ROOT}/label/test.tsv", f"{ROOT}/label/test.unt", **kw)
    ds_u = Stage1Dataset(f"{ROOT}/label/test.tsv", f"{ROOT}/label/test.unt",
                         emit_uint8=True, **kw)
    bf = ds_f.collate([ds_f.load(0), ds_f.load(1)], pad_to=12)
    bu = ds_u.collate([ds_u.load(0), ds_u.load(1)], pad_to=12)
    assert bu["video"].dtype == np.uint8
    np.testing.assert_allclose(
        np.asarray(dequantize_video(jnp.asarray(bu["video"]))),
        bf["video"], atol=2e-2)  # pad frames: fill-107 vs exact 0

    model, tx, state_f = stage1.create_train_state(cfg, jax.random.PRNGKey(0), bf)
    _, _, state_u = stage1.create_train_state(cfg, jax.random.PRNGKey(0), bu)
    step = stage1.make_train_step(model, tx, cfg)
    pad_id = cfg.model.units.pad
    sf = stage1.stack_accum([bf], pad_id=pad_id, batch_size=2)
    su = stage1.stack_accum([bu], pad_id=pad_id, batch_size=2)
    assert su["video"].dtype == np.uint8

    _, logs_f = step(state_f, sf, jax.random.PRNGKey(1))
    _, logs_u = step(state_u, su, jax.random.PRNGKey(1))
    lf, lu = float(logs_f["loss"]), float(logs_u["loss"])
    assert abs(lf - lu) / max(abs(lf), 1e-6) < 2e-3, (lf, lu)


def test_bf16_train_step(lrs3_sample_dir):
    """bf16 mixed-precision training (beyond-reference): step runs, loss is
    close to the f32 step, params/grads stay f32 (master weights)."""
    cfg = preset("multi_target")
    cfg = with_overrides(cfg, {
        "model.conformer": ConformerConfig(dim=32, ffn_dim=64, heads=2,
                                           layers=1, input_dim=512),
        "stage1.update_freq": 1, "stage1.batch_size": 2,
        "stage1.max_updates": 2, "stage1.warmup_updates": 1,
    })
    cfg_bf = with_overrides(cfg, {"stage1.bf16_compute": True})
    ds = Stage1Dataset(f"{ROOT}/label/test.tsv", f"{ROOT}/label/test.unt",
                       root_override=ROOT, train=False, max_frames=12,
                       emit_uint8=True)
    b = ds.collate([ds.load(0), ds.load(1)], pad_to=12)
    model, tx, state = stage1.create_train_state(cfg, jax.random.PRNGKey(0), b)
    stacked = stage1.stack_accum([b], pad_id=cfg.model.units.pad, batch_size=2)

    step_f = stage1.make_train_step(model, tx, cfg)
    step_b = stage1.make_train_step(model, tx, cfg_bf)
    state2 = jax.tree_util.tree_map(jnp.copy, state)
    new_f, logs_f = step_f(state, stacked, jax.random.PRNGKey(1))
    new_b, logs_b = step_b(state2, stacked, jax.random.PRNGKey(1))

    lf, lb = float(logs_f["loss"]), float(logs_b["loss"])
    assert np.isfinite(lb)
    assert abs(lf - lb) / max(abs(lf), 1e-6) < 0.02, (lf, lb)  # bf16 noise
    # master weights stay f32 after the update
    leaves = jax.tree_util.tree_leaves(new_b.params)
    assert all(x.dtype == jnp.float32 for x in leaves)
    assert float(logs_b["grad_norm"]) > 0
