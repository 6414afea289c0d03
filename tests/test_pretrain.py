"""AV-HuBERT masked pretraining tests."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lip2speech_tpu.models.avhubert_pretrain import (
    AVHubertPretrainModel,
    mask_video_frames,
    pretrain_loss,
)
from lip2speech_tpu.ops.masking import compute_mask_indices


def test_mask_indices_statistics():
    rng = np.random.default_rng(0)
    mask = compute_mask_indices((16, 100), None, mask_prob=0.8, mask_length=10,
                                rng=rng)
    assert mask.shape == (16, 100)
    frac = mask.mean()
    # with-overlap static policy lands near but under mask_prob
    assert 0.3 < frac < 0.9
    # respects padding
    pad = np.zeros((2, 100), bool)
    pad[1, 50:] = True  # fairseq padding_mask: True = PAD
    m2 = compute_mask_indices((2, 100), pad, 0.8, 10, rng)
    assert not m2[1, 50:].any() or m2[1, 50:].sum() < 10  # spans start in valid region


def test_pretrain_forward_and_loss_decreases():
    model = AVHubertPretrainModel(dim=32, heads=2, ffn_dim=64, layers=2,
                                  final_dim=16, num_classes=12)
    rng = np.random.default_rng(1)
    b, t = 2, 10
    video = jnp.asarray(rng.standard_normal((b, t, 24, 24, 1)).astype(np.float32))
    frames_mask = jnp.ones((b, t), bool)
    span = jnp.asarray(compute_mask_indices((b, t), None, 0.5, 3, rng))
    targets = jnp.asarray(rng.integers(0, 12, (b, t)).astype(np.int32))

    video_masked = mask_video_frames(video, span)
    assert float(jnp.abs(video_masked[span]).max()) == 0.0

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           video_masked, frames_mask, span, train=False)

    def loss_fn(params):
        out = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                          video_masked, frames_mask, span, train=False)
        loss, logs = pretrain_loss(out, targets)
        return loss, logs

    (l0, logs0), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(l0))
    assert int(logs0["n_masked"]) > 0

    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    params = variables["params"]
    for _ in range(8):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
    (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert float(l1) < float(l0)


def test_pretrain_audio_visual():
    """Audio modality (VERDICT r2 next #4): audio SubModel + learned mask_emb
    + modality dropout in pretraining; masked audio frames are replaced by
    mask_emb INSIDE the model (hubert.py:396, :625)."""
    model = AVHubertPretrainModel(dim=32, heads=2, ffn_dim=64, layers=2,
                                  final_dim=16, num_classes=12,
                                  audio_feat_dim=104, modality_dropout=0.5,
                                  audio_dropout=0.5, dropout=0.0)
    rng = np.random.default_rng(2)
    b, t = 2, 10
    video = jnp.asarray(rng.standard_normal((b, t, 24, 24, 1)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((b, t, 104)).astype(np.float32))
    frames_mask = jnp.ones((b, t), bool)
    span = jnp.asarray(compute_mask_indices((b, t), None, 0.5, 3, rng))
    targets = jnp.asarray(rng.integers(0, 12, (b, t)).astype(np.int32))

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           mask_video_frames(video, span), frames_mask, span,
                           train=False, audio=audio)
    assert "mask_emb" in variables["params"]
    assert "audio_proj" in variables["params"]

    # mask_emb is live: changing it changes the output at masked positions
    out1 = model.apply(variables, mask_video_frames(video, span), frames_mask,
                       span, train=False, audio=audio)
    v2 = jax.tree_util.tree_map(lambda x: x, variables)
    v2["params"]["mask_emb"] = v2["params"]["mask_emb"] + 1.0
    out2 = model.apply(v2, mask_video_frames(video, span), frames_mask, span,
                       train=False, audio=audio)
    assert float(jnp.abs(out1["logits"] - out2["logits"]).max()) > 1e-6

    # modality dropout draws differ across rng seeds under train=True
    outs = []
    for seed in range(4):
        out, _ = model.apply(variables, mask_video_frames(video, span),
                             frames_mask, span, train=True, audio=audio,
                             rngs={"dropout": jax.random.PRNGKey(seed)},
                             mutable=["batch_stats"])
        outs.append(np.asarray(out["logits"]))
    assert any(np.abs(outs[0] - o).max() > 1e-6 for o in outs[1:])

    # the full loss trains end to end with both modalities
    loss, logs = pretrain_loss(
        model.apply(variables, mask_video_frames(video, span), frames_mask,
                    span, train=False, audio=audio), targets)
    assert np.isfinite(float(loss))

    # audio-only (video=None) works too
    out_a = model.apply(variables, None, frames_mask, span, train=False,
                        audio=audio)
    assert out_a["logits"].shape == (b, t, 12)


def test_audio_params_exist_after_video_only_init():
    """audio_feat_dim > 0 must create audio_proj even when init saw no audio:
    otherwise a video-only-initialized checkpoint can never serve audio (the
    param tree would depend on which modalities happened to be present)."""
    from lip2speech_tpu.models.avhubert import AVHubertEncoder

    rng = np.random.default_rng(3)
    b, t = 2, 6
    video = jnp.asarray(rng.standard_normal((b, t, 24, 24, 1)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((b, t, 104)).astype(np.float32))
    frames_mask = jnp.ones((b, t), bool)
    key = jax.random.PRNGKey(1)

    enc = AVHubertEncoder(dim=32, heads=2, ffn_dim=64, layers=1,
                          dropout=0.0, audio_feat_dim=104)
    variables = enc.init({"params": key}, video, frames_mask, train=False)
    assert "audio_proj" in variables["params"]
    # the same variables now serve audio-only and audio+video
    enc.apply(variables, None, frames_mask, train=False, audio=audio)
    enc.apply(variables, video, frames_mask, train=False, audio=audio)

    model = AVHubertPretrainModel(dim=32, heads=2, ffn_dim=64, layers=1,
                                  final_dim=16, num_classes=12,
                                  audio_feat_dim=104, dropout=0.0)
    span = jnp.zeros((b, t), bool)
    variables = model.init({"params": key}, video, frames_mask, span,
                           train=False)          # NO audio at init
    assert "audio_proj" in variables["params"]
    assert "mask_emb" in variables["params"]
    model.apply(variables, video, frames_mask, span, train=False, audio=audio)
