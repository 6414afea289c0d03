"""The system LEARNS (VERDICT r2 next #1): overfit real bundled LRS3 data.

Trains a tiny stage-1 on truncated real utterances (real mouth videos, real
unit labels and mels from /root/reference/datasets/lrs3) and asserts the
training loss actually DESCENDS and the model memorizes the units
(accuracy > 0.9) — the reference's whole point is trained models, and "step
runs, loss finite" (r2's only training assertion) never showed that. The
full-scale quality loop with decode+vocode+STOI/ESTOI/PESQ is
scripts/quality_loop.py -> QUALITY.md; this is the in-suite net.

Matches the reference recipe semantics at toy scale:
conf/lrs3/multi_target.yaml:55-70 (Adam 0.9/0.98, LS-CE + 10x mel L1,
cosine LR with warmup).
"""

import numpy as np
import pytest

import jax

from lip2speech_tpu.core.config import ConformerConfig, preset, with_overrides
from lip2speech_tpu.data.stage1 import Stage1Dataset
from lip2speech_tpu.train import stage1

ROOT = "/root/reference/datasets/lrs3"
STEPS = 75


@pytest.mark.slow
def test_stage1_overfits_real_clips(lrs3_sample_dir):
    cfg = preset("multi_target")
    cfg = with_overrides(cfg, {
        "model.conformer": ConformerConfig(dim=64, ffn_dim=128, heads=4,
                                           layers=2, input_dim=512),
        "stage1.update_freq": 1,
        "stage1.batch_size": 2,
        "stage1.lr": 3e-3,
        "stage1.warmup_updates": 4,
        "stage1.max_updates": STEPS,
    })
    # 2 real utterances truncated to 16 frames at 44x44 center crop (XLA's
    # CPU conv3d backward is the cost driver: ~100 s/step at 3x24x88x88 on
    # the single-core suite machine, ~11 s/step here) — still real video,
    # real unit labels, real mels end to end
    ds = Stage1Dataset(f"{ROOT}/label/test.tsv", f"{ROOT}/label/test.unt",
                       root_override=ROOT, train=False, max_frames=16,
                       crop_size=44)
    batch = ds.collate([ds.load(i) for i in range(2)], pad_to=16)
    dev_batch = {k: v for k, v in batch.items() if k != "ids"}

    model, tx, state = stage1.create_train_state(cfg, jax.random.PRNGKey(0),
                                                 batch)
    step_fn = stage1.make_train_step(model, tx, cfg)
    eval_step = stage1.make_eval_step(model, cfg)
    stacked = stage1.stack_accum([batch], pad_id=cfg.model.units.pad,
                                 batch_size=2)

    def acc_of(st):
        c, t, _ = eval_step(st.params, st.batch_stats, dev_batch)
        return float(c) / max(float(t), 1.0)

    acc0 = acc_of(state)
    rng = jax.random.PRNGKey(1)
    losses = []
    for step in range(STEPS):
        state, logs = step_fn(state, stacked, jax.random.fold_in(rng, step))
        losses.append(float(logs["loss"]))

    # loss descends: the last-quarter mean is well below the first-quarter
    # mean, and the final loss is a small fraction of the initial one
    q = max(STEPS // 4, 1)
    assert np.mean(losses[-q:]) < 0.5 * np.mean(losses[:q]), (
        losses[:3], losses[-3:])
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])

    # the model memorized the real unit labels
    acc = acc_of(state)
    assert acc > 0.9, f"final unit accuracy {acc} (init {acc0})"
    assert acc > acc0 + 0.3
