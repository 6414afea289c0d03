"""Stage-1 training CLI (fairseq-hydra-train replacement).

Reference flow: train.sh -> fairseq-hydra-train --config-name multi_target*
(SURVEY.md §3.2). Here: one process, pjit DP over all local devices, grad
accumulation update_freq, best-accuracy checkpointing.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="multi_target")
    p.add_argument("--train-tsv", required=True)
    p.add_argument("--train-unt", required=True)
    p.add_argument("--valid-tsv")
    p.add_argument("--valid-unt")
    p.add_argument("--root")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--max-updates", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--update-freq", type=int, default=None)
    p.add_argument("--save-interval", type=int, default=1000)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--uint8-video", action="store_true",
                   help="ship video to the device as uint8 and normalize "
                        "on-device (4x less host->device transfer; the train "
                        "step is bandwidth-bound, NOTES r3)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest s1_* checkpoint in --checkpoint-dir "
                        "(params, optimizer, step) and continue")
    args = p.parse_args(argv)

    import jax

    from lip2speech_tpu.core.config import preset, with_overrides
    from lip2speech_tpu.data.stage1 import Stage1Dataset
    from lip2speech_tpu.parallel.mesh import fitting_mesh
    from lip2speech_tpu.train import checkpoint as ckpt
    from lip2speech_tpu.train import stage1

    cfg = preset(args.preset)
    overrides = {}
    if args.max_updates:
        overrides["stage1.max_updates"] = args.max_updates
    if args.batch_size:
        overrides["stage1.batch_size"] = args.batch_size
    if args.update_freq:
        overrides["stage1.update_freq"] = args.update_freq
    if overrides:
        cfg = with_overrides(cfg, overrides)

    ds = Stage1Dataset(args.train_tsv, args.train_unt, root_override=args.root,
                       train=True, random_erase=True, time_mask=True,
                       seed=args.seed, emit_uint8=args.uint8_video)
    val_ds = None
    if args.valid_tsv:
        val_ds = Stage1Dataset(args.valid_tsv, args.valid_unt,
                               root_override=args.root, train=False,
                               emit_uint8=args.uint8_video)
    mesh = fitting_mesh(cfg.stage1.batch_size)
    print(f"devices: {jax.device_count()}, mesh: {mesh.shape}")

    # init from one micro-batch
    first = next(ds.batches(cfg.stage1.batch_size, shuffle=True))
    model, tx, state = stage1.create_train_state(cfg, jax.random.PRNGKey(args.seed), first)
    step_fn = stage1.make_train_step(model, tx, cfg, mesh)
    eval_step = stage1.make_eval_step(model, cfg) if val_ds is not None else None

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params / 1e6:.1f}M")

    from lip2speech_tpu.utils.metrics_log import MetricsLogger

    ckpt_dir = Path(args.checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    mlog = MetricsLogger(ckpt_dir / "logs")
    best_path = ckpt_dir / "best.json"
    best_acc = -1.0
    update = 0
    if args.resume:
        state, update = ckpt.restore_stage1(ckpt_dir, state)
        if update:
            print(f"resumed from update {update}")
        if best_path.exists():
            best_acc = json.loads(best_path.read_text()).get("accuracy", -1.0)
    rng = jax.random.PRNGKey(args.seed)
    pad_id = cfg.model.units.pad

    def save_best(acc: float, source: str):
        nonlocal best_acc
        if acc > best_acc:  # best-accuracy policy like the reference
            best_acc = acc
            ckpt.save_stage1(ckpt_dir, state, 0)  # s1_00000000 = best
            best_path.write_text(json.dumps(
                {"accuracy": acc, "update": update, "metric": source}))

    def accum_stream():
        """Endless stream of stacked accum batches — decoded/collated on the
        prefetch worker thread while the device runs the previous update
        (fairseq's num_workers: 3 equivalent; cv2/numpy release the GIL)."""
        while True:
            micro_batches = []
            for batch in ds.batches(cfg.stage1.batch_size, shuffle=True):
                micro_batches.append(batch)
                if len(micro_batches) == cfg.stage1.update_freq:
                    yield stage1.stack_accum(micro_batches, pad_id=pad_id,
                                             batch_size=cfg.stage1.batch_size)
                    micro_batches = []

    from lip2speech_tpu.data.prefetch import prefetch

    t0 = time.time()
    # accum_stream() is ENDLESS, so the loop always exits via break;
    # close() stops the prefetch fill thread and frees its buffered batches
    stream = prefetch(accum_stream(), depth=2)
    try:
        for stacked in stream:
            if update >= cfg.stage1.max_updates:
                break  # e.g. --resume on an already-complete run
            state, logs = step_fn(state, stacked,
                                  jax.random.fold_in(rng, update))
            update += 1
            if update % args.log_interval == 0:
                acc = float(logs["n_correct"]) / max(float(logs["total"]), 1)
                print(json.dumps({
                    "update": update,
                    "loss": round(float(logs["loss"]), 3),
                    "nll": round(float(logs["nll_loss"]), 3),
                    "mel": round(float(logs["mel_loss"]), 3),
                    "acc": round(acc, 4),
                    "ups": round(update / (time.time() - t0), 3),
                }))
                mlog.scalars(update, loss=logs["loss"], nll=logs["nll_loss"],
                             mel=logs["mel_loss"], acc=acc,
                             grad_norm=logs["grad_norm"])
            if update % args.save_interval == 0:
                ckpt.save_stage1(ckpt_dir, state, update)
                if val_ds is not None:
                    # best-on-validation accuracy, like the reference
                    # (conf/lrs3/multi_target.yaml: best_checkpoint_metric:
                    # accuracy over the valid subset)
                    val = stage1.evaluate(model, state, val_ds,
                                          cfg.stage1.batch_size, cfg,
                                          eval_step=eval_step)
                    print(json.dumps({"update": update,
                                      "val_acc": round(val["accuracy"], 4),
                                      "val_nll": round(val["nll"], 4)}))
                    mlog.scalars(update, val_acc=val["accuracy"],
                                 val_nll=val["nll"])
                    save_best(val["accuracy"], "valid_accuracy")
                else:
                    acc = float(logs["n_correct"]) / max(float(logs["total"]), 1)
                    save_best(acc, "train_accuracy")
            if update >= cfg.stage1.max_updates:
                break
    finally:
        stream.close()
    ckpt.save_stage1(ckpt_dir, state, update)
    print(f"done: {update} updates in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
