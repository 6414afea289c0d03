"""Batch inference CLI: dataset -> pred_mel/*.npy, pred_unit/*.txt,
hypo-*.json, wer.* artifacts.

Rebuild of reference multi_target_lip2speech/inference.py:73-371 (the offline
benchmark path of test_dataset.sh): loads a checkpoint (converted torch .pt or
native orbax), runs bucketed batched decode on TPU, writes the same artifact
layout, computes unit-level WER/accuracy.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from lip2speech_tpu.core.config import PipelineConfig, preset
from lip2speech_tpu.data.manifest import read_manifest
from lip2speech_tpu.data.stage1 import Stage1Dataset
from lip2speech_tpu.decode.units import argmax_units
from lip2speech_tpu.native import edit_distance as unit_edit_distance


def run_inference(
    cfg: PipelineConfig,
    variables: dict,
    tsv_path: str | Path,
    unt_path: str | Path | None,
    results_path: str | Path,
    batch_size: int = 4,
    root_override=None,
    suppress_crashes: bool = False,
    prefetch_depth: int = 3,
) -> dict:
    import jax
    import jax.numpy as jnp

    from lip2speech_tpu.models.multi_target import MultiTargetModel

    model = MultiTargetModel(cfg.model)
    results_path = Path(results_path)
    (results_path / "pred_mel").mkdir(parents=True, exist_ok=True)
    (results_path / "pred_unit").mkdir(parents=True, exist_ok=True)

    @jax.jit
    def forward(vars_, video, mask, spk):
        out = model.apply(vars_, video, mask, spk, train=False)
        units = argmax_units(out["unit_logits"], out["mask"])
        return units, out["mel"], out["mask"]

    ds = Stage1Dataset(tsv_path, unt_path, root_override=root_override, train=False)
    result = {"utt_id": [], "ref": [], "hypo": []}
    refs = {u.uid: u.units for u in ds.utts}

    from lip2speech_tpu.data.prefetch import prefetch

    t0 = time.time()
    n_tokens = 0
    n_failed = 0
    for batch in prefetch(ds.batches(batch_size), depth=prefetch_depth):
        try:
            units, mel, mask = forward(variables, jnp.asarray(batch["video"]),
                                       jnp.asarray(batch["frames_mask"]),
                                       jnp.asarray(batch["spk_emb"]))
            units, mel, mask = map(np.asarray, (units, mel, mask))
        except Exception:
            # reference suppress_crashes flag (inference.py:340-344)
            if not suppress_crashes:
                raise
            n_failed += len(batch["ids"])
            continue
        for i, uid in enumerate(batch["ids"]):
            n = int(batch["frames_mask"][i].sum())
            hypo_units = units[i][: 2 * n]
            hypo_str = " ".join(str(int(u)) for u in hypo_units if u >= 0)
            ref_units = refs.get(uid)
            ref_str = (" ".join(str(int(u)) for u in ref_units)
                       if ref_units is not None else "")
            result["utt_id"].append(uid)
            result["hypo"].append(hypo_str)
            result["ref"].append(ref_str)
            n_tokens += 2 * n

            mel_path = results_path / "pred_mel" / f"{uid}.npy"
            mel_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(mel_path, mel[i][: 4 * n])
            unit_path = results_path / "pred_unit" / f"{uid}.txt"
            unit_path.parent.mkdir(parents=True, exist_ok=True)
            unit_path.write_text(hypo_str)
    elapsed = time.time() - t0

    import hashlib

    fid = int(hashlib.md5(str(sorted(result["utt_id"])).encode()).hexdigest(), 16) % 1_000_000
    json.dump(result, open(results_path / f"hypo-{fid}.json", "w"), indent=4)

    n_err = n_total = n_equal = 0
    for hypo, ref in zip(result["hypo"], result["ref"]):
        h, r = hypo.split(), ref.split()
        n_err += unit_edit_distance([int(x) for x in h], [int(x) for x in r])
        n_equal += sum(a == b for a, b in zip(h, r))
        n_total += len(r)
    wer = 100 * n_err / max(n_total, 1)
    accuracy = 100 * n_equal / max(n_total, 1)
    (results_path / f"wer.{fid}").write_text(
        f"WER: {wer}\nAccuracy: {accuracy}\n"
        f"err / num_ref_words = {n_err} / {n_total}\n\n")
    return {"wer": wer, "accuracy": accuracy, "n_utts": len(result["utt_id"]),
            "n_failed": n_failed, "elapsed_s": elapsed,
            "tokens_per_s": n_tokens / max(elapsed, 1e-9)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="multi_target")
    p.add_argument("--checkpoint", help=".pt (torch, converted on load) or orbax dir")
    p.add_argument("--tsv", required=True)
    p.add_argument("--unt")
    p.add_argument("--root")
    p.add_argument("--results-path", required=True)
    p.add_argument("--batch-size", type=int, default=4)
    args = p.parse_args()

    cfg = preset(args.preset)
    if args.checkpoint and args.checkpoint.endswith(".pt"):
        from lip2speech_tpu.convert.torch_to_jax import (
            convert_multi_target, load_torch_state)

        variables = convert_multi_target(load_torch_state(args.checkpoint), cfg.model)
    elif args.checkpoint:
        from lip2speech_tpu.train.checkpoint import load_pytree

        state = load_pytree(args.checkpoint)
        variables = {"params": state["params"],
                     "batch_stats": state.get("batch_stats", {})}
    else:
        raise SystemExit("--checkpoint required")

    stats = run_inference(cfg, variables, args.tsv, args.unt,
                          args.results_path, args.batch_size, args.root)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
