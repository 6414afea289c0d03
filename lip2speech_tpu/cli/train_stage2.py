"""Stage-2 (vocoder) GAN training CLI.

Reference flow: multi_input_vocoder/train.py (SURVEY.md §3.3): epoch loop,
0.56 s segments, D then G step, g_/do_ checkpoints every 10k steps,
validation mel-L1 every 1k, per-epoch ExponentialLR.
"""

from __future__ import annotations

import argparse
import numpy as np
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
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--mel-aug", action="store_true",
                   help="Gaussian blur+noise on input mels (the 'aug' config)")
    p.add_argument("--checkpoint-interval", type=int, default=10_000)
    p.add_argument("--validation-interval", type=int, default=1_000)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest g_/do_ checkpoint pair in "
                        "--checkpoint-dir (G, D, both optimizers, step, epoch) "
                        "and continue — reference train.py:63-98")
    p.add_argument("--fused-gen", action="store_true",
                   help="run the generator forward through the VMEM-fused "
                        "resblock-trio Pallas kernel (TPU; gradients flow "
                        "through the XLA path via custom_vjp)")
    args = p.parse_args(argv)

    import jax

    from lip2speech_tpu.core.config import preset, with_overrides
    from lip2speech_tpu.data.stage2 import Stage2Dataset
    from lip2speech_tpu.parallel.mesh import fitting_mesh
    from lip2speech_tpu.train import checkpoint as ckpt
    from lip2speech_tpu.train import stage2

    cfg = preset(args.preset)
    if args.batch_size:
        cfg = with_overrides(cfg, {"stage2.batch_size": args.batch_size})
    if args.fused_gen:
        cfg = with_overrides(cfg, {"vocoder.fused_tail_kernel": True})

    ds = Stage2Dataset(args.train_tsv, args.train_unt, cfg.vocoder,
                       root_override=args.root, train=True, mel_aug=args.mel_aug)
    val_ds = None
    if args.valid_tsv:
        val_ds = Stage2Dataset(args.valid_tsv, args.valid_unt, cfg.vocoder,
                               root_override=args.root, train=False)

    mesh = fitting_mesh(cfg.stage2.batch_size)
    first = next(ds.batches(cfg.stage2.batch_size))
    first = {k: v for k, v in first.items() if k != "ids"}
    models, txs, state = stage2.create_gan_state(cfg, jax.random.PRNGKey(cfg.stage2.seed), first)
    step_fn = stage2.make_gan_step(models, txs, cfg, mesh)

    from lip2speech_tpu.utils.metrics_log import MetricsLogger

    ckpt_dir = Path(args.checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    mlog = MetricsLogger(ckpt_dir / "logs")
    rng = jax.random.PRNGKey(cfg.stage2.seed)
    steps = 0
    start_epoch = 0
    if args.resume:
        state, steps = ckpt.restore_stage2(ckpt_dir, state)
        start_epoch = int(state.epoch)
        if steps:
            print(f"resumed from step {steps}, epoch {start_epoch}")
    from lip2speech_tpu.data.prefetch import prefetch

    t0 = time.time()
    for epoch in range(start_epoch, args.epochs):
        # audio decode + segment sampling overlap the device step
        # (fairseq/torch num_workers equivalent)
        for batch in prefetch(ds.batches(cfg.stage2.batch_size), depth=2):
            batch = {k: v for k, v in batch.items() if k != "ids"}
            state, logs = step_fn(state, batch, jax.random.fold_in(rng, steps))
            steps += 1
            if steps % args.log_interval == 0:
                rec = {
                    "epoch": epoch, "step": steps,
                    "loss_gen": round(float(logs["loss_gen"]), 3),
                    "loss_disc": round(float(logs["loss_disc"]), 3),
                    "mel_l1": round(float(logs["loss_mel"]), 4),
                    "sps": round(steps / (time.time() - t0), 2),
                }
                print(json.dumps(rec))
                mlog.scalars(steps, loss_gen=logs["loss_gen"],
                             loss_disc=logs["loss_disc"], mel_l1=logs["loss_mel"])
            if steps % args.checkpoint_interval == 0:
                ckpt.save_stage2(ckpt_dir, state, steps)
            if val_ds is not None and steps % args.validation_interval == 0:
                # full validation pass, mel-L1 averaged over all batches
                # (reference train.py:219-241 iterates the whole val loader)
                tot, nb, vb0 = 0.0, 0, None
                for vb in val_ds.batches(cfg.stage2.batch_size, shuffle=False):
                    vb = {k: v for k, v in vb.items() if k != "ids"}
                    if vb0 is None:
                        vb0 = vb
                    tot += float(stage2.validation_mel_l1(
                        models[0], state.gen_params, vb, cfg))
                    nb += 1
                val = tot / max(nb, 1)
                print(json.dumps({"step": steps, "val_mel_l1": round(val, 4),
                                  "val_batches": nb}))
                mlog.scalars(steps, val_mel_l1=val)
                # validation audio snapshot (reference train.py:219-241)
                import jax.numpy as jnp
                wav = models[0].apply({"params": state.gen_params},
                                      jnp.asarray(vb0["code"][:1]),
                                      jnp.asarray(vb0["mel"][:1]),
                                      jnp.asarray(vb0["spk_emb"][:1]),
                                      deterministic=True)
                mlog.audio(steps, "val_pred", np.asarray(wav)[0])
                # spectrogram figures of generated vs ground-truth audio
                # (reference train.py:222-241 y_hat_spec / y_spec figures)
                from lip2speech_tpu.ops.dsp import mel_spectrogram_hifigan

                pred_mel = mel_spectrogram_hifigan(
                    wav[:1], cfg.audio.sample_rate, cfg.audio.loss_n_fft,
                    cfg.audio.loss_hop_length, cfg.audio.loss_win_length,
                    cfg.audio.num_mels, cfg.audio.fmin, cfg.audio.loss_fmax)
                mlog.mel(steps, "val_pred_spec", np.asarray(pred_mel)[0])
                mlog.mel(steps, "val_gt_spec", np.asarray(vb0["mel"][0]),
                         figure=True)
        state = stage2.next_epoch(state)
    ckpt.save_stage2(ckpt_dir, state, steps)
    print(f"done: {steps} steps, {args.epochs} epochs")


if __name__ == "__main__":
    main()
