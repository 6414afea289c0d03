"""Quality loop: prove the full stack LEARNS on the bundled LRS3 sample.

Trains a reduced-size stage-1 (conformer multi_target) on real bundled LRS3
utterances (real mouth videos, unit labels, mels, speaker embeddings), then
stage-2 (multi-input HiFi-GAN) on the same audio; snapshots at init/mid/final
are pushed through the full Lip2SpeechPipeline (greedy unit decode +
predicted mel -> vocoder) and scored with STOI/ESTOI/PESQ against the
ground-truth audio plus unit accuracy and mel L1. Artifacts:
<out>/quality_loop.json (+ curves) consumed by QUALITY.md.

Two protocols:
  overfit (default): train AND evaluate on the 5 test clips — the
    sanity-check demo from round 3.
  generalization (VERDICT r3 next #3): --train-split train+valid
    --eval-split test trains on the 10 trainval clips and evaluates on the
    5 HELD-OUT test clips (never seen in training) — the in-image analog of
    the reference's unseen-test headline (/root/reference/README.md:105-107):
      python scripts/quality_loop.py --train-split train+valid \\
          --eval-split test --out artifacts/generalization

Training semantics match the reference recipes at reduced scale:
  stage-1: conf/lrs3/multi_target.yaml:55-70 (Adam 0.9/0.98, LS-CE + 10x mel
           L1, cosine LR w/ warmup) — reduced dims/steps for the 5-clip set
  stage-2: multi_input_vocoder/train.py:127-245 (two Adam 0.8/0.99 opts,
           45x mel L1 + FM + LSGAN adv, random 8960-sample segments)

Run to completion in the background (TPU relay rule: never timeout-kill):
  python scripts/quality_loop.py --out artifacts/quality &
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

ROOT = "/root/reference/datasets/lrs3"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/quality")
    ap.add_argument("--platform", default=None, help="cpu to force CPU")
    ap.add_argument("--steps1", type=int, default=400)
    ap.add_argument("--steps2", type=int, default=800)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--lr1", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-frames", type=int, default=600,
                    help="truncate clips (CPU smoke tests use small values)")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate snapshots saved in --out")
    ap.add_argument("--train-split", default="test",
                    help="'+'-joined label splits to train on (e.g. "
                         "train+valid for the 10 trainval clips)")
    ap.add_argument("--eval-split", default=None,
                    help="held-out split to evaluate on (e.g. test); "
                         "default: evaluate on the training clips (overfit "
                         "demo)")
    ap.add_argument("--aug", action="store_true",
                    help="per-step video augmentation (flip/erase/time-mask"
                         " — the reference training transforms) on a uint8 "
                         "wire batch; the generalization protocol's "
                         "anti-overfit knob")
    ap.add_argument("--snap-every", type=int, default=0,
                    help="stage-1 snapshot every N steps (0: init/mid/final"
                         " only); extra snapshots are evaluated against the"
                         " FINAL vocoder to trace held-out quality vs "
                         "training progress")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-test-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from lip2speech_tpu.core.config import (ConformerConfig, preset,
                                            with_overrides)
    from lip2speech_tpu.data.stage1 import Stage1Dataset
    from lip2speech_tpu.data.stage2 import Stage2Dataset
    from lip2speech_tpu.eval.harness import evaluate_pair
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline
    from lip2speech_tpu.train import stage1, stage2
    from lip2speech_tpu.utils.audio_io import peak_normalize, read_wav

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # ---- data: real bundled utterances, deterministic transforms ----
    def split_ds(cls, splits, **kw):
        parts = [cls(f"{ROOT}/label/{s}.tsv", f"{ROOT}/label/{s}.unt",
                     root_override=ROOT, **kw) for s in splits]
        for extra in parts[1:]:
            parts[0].utts = parts[0].utts + extra.utts
        return parts[0]

    train_splits = args.train_split.split("+")
    ds = split_ds(Stage1Dataset, train_splits, train=False,
                  max_frames=args.max_frames, emit_uint8=args.aug)
    batch = ds.collate([ds.load(i) for i in range(len(ds))])
    ids = batch["ids"]
    print(f"stage-1 batch: video {batch['video'].shape}, ids {ids}", flush=True)

    # held-out evaluation set (generalization protocol); defaults to the
    # training clips (overfit demo)
    if args.eval_split:
        eval_ds = split_ds(Stage1Dataset, [args.eval_split], train=False,
                           max_frames=args.max_frames)
        eval_batch = eval_ds.collate(
            [eval_ds.load(i) for i in range(len(eval_ds))])
        print(f"eval batch ({args.eval_split}): "
              f"video {eval_batch['video'].shape}, ids {eval_batch['ids']}",
              flush=True)
    else:
        eval_ds, eval_batch = ds, batch
    eval_ids = eval_batch["ids"]

    cfg = preset("multi_target")
    cfg = with_overrides(cfg, {
        "model.conformer": ConformerConfig(
            dim=args.dim, ffn_dim=2 * args.dim, heads=4, layers=args.layers,
            input_dim=512),
        "stage1.update_freq": 1,
        "stage1.batch_size": len(ds),
        "stage1.lr": args.lr1,
        "stage1.warmup_updates": max(args.steps1 // 20, 5),
        "stage1.max_updates": args.steps1,
    })

    # ---- stage-1 overfit ----
    model, tx, state = stage1.create_train_state(
        cfg, jax.random.PRNGKey(args.seed), batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    step_fn = stage1.make_train_step(model, tx, cfg)
    eval_step = stage1.make_eval_step(model, cfg)
    stacked = stage1.stack_accum([batch], pad_id=cfg.model.units.pad,
                                 batch_size=len(ds))
    dev_batch = {k: v for k, v in batch.items() if k != "ids"}
    eval_dev_batch = {k: v for k, v in eval_batch.items() if k != "ids"}

    def snapshot_s1(st, step):
        snap = jax.tree_util.tree_map(
            np.asarray, {"params": st.params, "batch_stats": st.batch_stats})
        (out_dir / f"snap_s1_{step}.pkl").write_bytes(pickle.dumps(snap))
        return snap

    def acc_of(st):
        c, t, nll = eval_step(st.params, st.batch_stats, dev_batch)
        return float(c) / max(float(t), 1.0), float(nll) / max(float(t), 1.0)

    rng = jax.random.PRNGKey(args.seed + 1)
    np_rng = np.random.default_rng(args.seed + 17)
    mid1 = args.steps1 // 2

    def augment(b):
        """Per-clip reference training transforms (flip / erase / time-mask,
        data/transforms.py) applied to the collated uint8 batch — fresh
        draws every step, cheap on the wire (uint8 is 4x smaller)."""
        from lip2speech_tpu.data.transforms import (UINT8_FILL,
                                                    horizontal_flip,
                                                    random_erase, time_mask)

        v = b["video"].copy()
        for i in range(v.shape[0]):
            clip = v[i, :, :, :, 0]
            clip = horizontal_flip(clip, np_rng)
            clip = random_erase(clip, np_rng, fill=UINT8_FILL)
            clip = time_mask(clip, np_rng, fill=UINT8_FILL)
            v[i, :, :, :, 0] = clip
        return {**b, "video": v}

    def want_snap(step):
        if step in (mid1, args.steps1):
            return True
        return bool(args.snap_every) and step % args.snap_every == 0

    acc_final = nll_final = None
    if not args.eval_only:
        snaps1 = {0: snapshot_s1(state, 0)}
        curve1 = []
        t0 = time.time()
        for step in range(1, args.steps1 + 1):
            if args.aug:
                stacked = stage1.stack_accum([augment(batch)],
                                             pad_id=cfg.model.units.pad,
                                             batch_size=len(ds))
            state, logs = step_fn(state, stacked, jax.random.fold_in(rng, step))
            loss = float(logs["loss"])
            curve1.append(loss)
            if step in (1, mid1, args.steps1) or step % 50 == 0:
                acc, nll = acc_of(state)
                print(f"s1 step {step}: loss {loss:.3f} acc {acc:.4f} "
                      f"nll {nll:.3f} ({time.time() - t0:.0f}s)", flush=True)
            if want_snap(step):
                snaps1[step] = snapshot_s1(state, step)
        acc_final, nll_final = acc_of(state)
        (out_dir / "s1_curve.json").write_text(json.dumps(curve1))
        print(f"stage-1 done: {n_params / 1e6:.2f}M params, "
              f"final acc {acc_final:.4f}", flush=True)
    else:
        snaps1 = {int(p.stem.split("_")[-1]): pickle.loads(p.read_bytes())
                  for p in sorted(out_dir.glob("snap_s1_*.pkl"))}
        print(f"eval-only: loaded s1 snapshots {sorted(snaps1)}", flush=True)

    # ---- stage-2 GAN on the same 5 clips ----
    ds2 = split_ds(Stage2Dataset, train_splits, cfg=cfg.vocoder, train=True,
                   seed=args.seed)
    b2 = ds2.collate(list(range(len(ds2))))
    b2 = {k: v for k, v in b2.items() if k != "ids"}
    models2, txs2, gstate = stage2.create_gan_state(
        cfg, jax.random.PRNGKey(args.seed + 2), b2)
    gan_step = stage2.make_gan_step(models2, txs2, cfg)

    def snapshot_g(st, step):
        snap = jax.tree_util.tree_map(np.asarray, st.gen_params)
        (out_dir / f"snap_g_{step}.pkl").write_bytes(pickle.dumps(snap))
        return snap

    mid2 = args.steps2 // 2
    if not args.eval_only:
        snaps2 = {0: snapshot_g(gstate, 0)}
        curve2 = []
        t0 = time.time()
        for step in range(1, args.steps2 + 1):
            seg = ds2.collate(list(range(len(ds2))))   # fresh random segments
            seg = {k: jnp.asarray(v) for k, v in seg.items() if k != "ids"}
            gstate, logs = gan_step(gstate, seg,
                                    jax.random.fold_in(rng, 10_000 + step))
            curve2.append({k: float(v) for k, v in logs.items()})
            if step in (1, mid2, args.steps2) or step % 100 == 0:
                print(f"s2 step {step}: mel {curve2[-1]['loss_mel']:.3f} "
                      f"gen {curve2[-1]['loss_gen']:.2f} "
                      f"disc {curve2[-1]['loss_disc']:.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if step == mid2:
                snaps2[mid2] = snapshot_g(gstate, mid2)
        snaps2[args.steps2] = snapshot_g(gstate, args.steps2)
        (out_dir / "s2_curve.json").write_text(json.dumps(curve2))
        print("stage-2 done", flush=True)
    else:
        snaps2 = {int(p.stem.split("_")[-1]): pickle.loads(p.read_bytes())
                  for p in sorted(out_dir.glob("snap_g_*.pkl"))}
        print(f"eval-only: loaded g snapshots {sorted(snaps2)}", flush=True)

    # ---- e2e eval at init / mid / final (held-out when --eval-split) ----
    gt = {}
    for utt in eval_ds.utts:
        wav, sr = read_wav(utt.audio_path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        gt[utt.uid] = peak_normalize(wav.astype(np.float32), 0.95)

    if args.snap_every:
        # trace held-out quality vs stage-1 progress against the FINAL
        # vocoder (init row keeps the all-random floor)
        s2_last = max(snaps2)
        points = [(s, 0 if s == 0 else s2_last) for s in sorted(snaps1)]
    else:
        points = list(zip(sorted(snaps1), sorted(snaps2)))
    report = {"train_ids": ids, "eval_ids": eval_ids,
              "train_split": args.train_split,
              "eval_split": args.eval_split or args.train_split,
              "held_out": bool(args.eval_split),
              "n_params_stage1": int(n_params),
              "config": {"dim": args.dim, "layers": args.layers,
                         "steps1": args.steps1, "steps2": args.steps2,
                         "lr1": args.lr1},
              "final_train": {"unit_accuracy": acc_final,
                              "unit_nll": nll_final},
              "snapshots": []}
    # one pipeline instance: params are jit ARGUMENTS, so swapping the attrs
    # between snapshots reuses the single compiled e2e program
    pipe = Lip2SpeechPipeline(cfg, snaps1[0], snaps2[0])
    for s1_step, s2_step in points:
        pipe.stage1_variables = snaps1[s1_step]
        pipe.vocoder_params = snaps2[s2_step]
        results = pipe.synthesise_batch(eval_batch["video"],
                                        eval_batch["frames_mask"],
                                        eval_batch["spk_emb"])
        # unit accuracy / nll of this stage-1 snapshot on the EVAL clips
        sv = snaps1[s1_step]
        c, t, nll = eval_step(sv["params"], sv["batch_stats"],
                              eval_dev_batch)
        metrics = {"stoi": [], "estoi": [], "pesq": [], "mel_l1": []}
        for i, res in enumerate(results):
            uid = eval_ids[i]
            m = evaluate_pair(res.wav, gt[uid])
            metrics["stoi"].append(m["stoi"])
            metrics["estoi"].append(m["estoi"])
            if "pesq" in m:
                metrics["pesq"].append(m["pesq"])
            n_mel = res.mel.shape[0]
            gt_mel = np.asarray(eval_batch["mel"][i][:n_mel])
            metrics["mel_l1"].append(float(np.abs(res.mel - gt_mel).mean()))
            wav_path = out_dir / f"wav_s1{s1_step}_s2{s2_step}_{i}.npy"
            np.save(wav_path, res.wav)
        snap = {"s1_step": s1_step, "s2_step": s2_step,
                "unit_accuracy": float(c) / max(float(t), 1.0),
                "unit_nll": float(nll) / max(float(t), 1.0),
                **{k: float(np.mean(v)) if v else None
                   for k, v in metrics.items()}}
        if args.eval_split:
            tc, tt, tnll = eval_step(sv["params"], sv["batch_stats"],
                                     dev_batch)
            snap["train_unit_accuracy"] = float(tc) / max(float(tt), 1.0)
            snap["train_unit_nll"] = float(tnll) / max(float(tt), 1.0)
        report["snapshots"].append(snap)
        print(json.dumps(snap), flush=True)

    # ---- checkpoint selection (VERDICT r4 next #5) ----
    # Pick the snapshot by held-out ESTOI (tie-break: unit accuracy) instead
    # of blindly reporting the final step — the reference's own practice
    # (best_checkpoint_metric: accuracy, conf/lrs3/multi_target.yaml:12-17).
    # Both rows stay in the report so selected-vs-final is visible.
    trained = [s for s in report["snapshots"] if s["s1_step"] > 0]
    if trained:
        def _sel_key(s):
            return (s["estoi"] if s.get("estoi") is not None else -1e9,
                    s.get("unit_accuracy") or 0.0)
        best = max(trained, key=_sel_key)
        final = max(trained, key=lambda s: (s["s1_step"], s["s2_step"]))
        report["selected"] = {
            "metric": "estoi",
            "best": best, "final": final,
            "estoi_gain_vs_final": (None if best.get("estoi") is None
                                    or final.get("estoi") is None else
                                    float(best["estoi"] - final["estoi"])),
        }
        print("selected checkpoint:", json.dumps(report["selected"]),
              flush=True)

    if acc_final is None and report["snapshots"]:
        report["final_train"] = {
            "unit_accuracy": report["snapshots"][-1].get(
                "train_unit_accuracy",
                report["snapshots"][-1]["unit_accuracy"]),
            "unit_nll": report["snapshots"][-1].get(
                "train_unit_nll", report["snapshots"][-1]["unit_nll"])}
    (out_dir / "quality_loop.json").write_text(json.dumps(report, indent=2))
    print("wrote", out_dir / "quality_loop.json", flush=True)


if __name__ == "__main__":
    main()
