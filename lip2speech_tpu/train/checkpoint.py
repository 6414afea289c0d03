"""Checkpoint IO (orbax) — save/restore/scan for both stages.

Replaces fairseq checkpoint_utils (stage 1) and the g_########/do_########
scheme of reference multi_input_vocoder/train.py:63-98. Keeps the reference's
split: generator-only checkpoints for serving, full train state for resume.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: str | Path, tree: Any) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)


def load_pytree(path: str | Path, target: Any | None = None) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(Path(path).absolute(), item=target)
    return ckptr.restore(Path(path).absolute())


def scan_checkpoints(ckpt_dir: str | Path, prefix: str) -> Path | None:
    """Latest checkpoint with the given prefix (reference scan_checkpoint)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_step = None, -1
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(rf"{re.escape(prefix)}(\d+)", p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def save_stage1(ckpt_dir: str | Path, state, step: int) -> Path:
    path = Path(ckpt_dir) / f"s1_{step:08d}"
    save_pytree(path, {"params": state.params, "batch_stats": state.batch_stats,
                       "opt_state": state.opt_state, "step": state.step})
    return path


def restore_stage1(ckpt_dir: str | Path, state):
    """Restore the latest s1_* full train state for --resume.

    Returns (state, update) or (state, 0) when nothing to restore. The best
    checkpoint (s1_00000000) is skipped — resume continues from the newest.
    Mirrors fairseq's checkpoint_last restoration (reference trains resume via
    fairseq checkpoint_utils; stage-2 analogue: multi_input_vocoder/
    train.py:63-98)."""
    path = scan_checkpoints(ckpt_dir, "s1_")
    if path is None or path.name == "s1_00000000":
        return state, 0
    target = {"params": state.params, "batch_stats": state.batch_stats,
              "opt_state": state.opt_state, "step": state.step}
    restored = load_pytree(path, target)
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    return state, int(path.name.split("_")[1])


def restore_stage2(ckpt_dir: str | Path, state):
    """Restore the latest g_/do_ pair (generator, discriminators, both
    optimizers, step, epoch) — reference multi_input_vocoder/train.py:63-98.

    Returns (state, steps) or (state, 0)."""
    g_path = scan_checkpoints(ckpt_dir, "g_")
    do_path = scan_checkpoints(ckpt_dir, "do_")
    if g_path is None or do_path is None:
        return state, 0
    g = load_pytree(g_path, {"generator": state.gen_params})
    do = load_pytree(do_path, {
        "mpd": state.mpd_params, "msd": state.msd_params,
        "msd_spectral": state.msd_spectral,
        "gen_opt": state.gen_opt, "disc_opt": state.disc_opt,
        "step": state.step, "epoch": state.epoch,
    })
    state = state.replace(
        gen_params=g["generator"], mpd_params=do["mpd"], msd_params=do["msd"],
        msd_spectral=do["msd_spectral"], gen_opt=do["gen_opt"],
        disc_opt=do["disc_opt"], step=do["step"], epoch=do["epoch"])
    return state, int(g_path.name.split("_")[1])


def save_stage2(ckpt_dir: str | Path, state, step: int) -> tuple[Path, Path]:
    """g_* holds generator weights only; do_* the rest (reference layout)."""
    g_path = Path(ckpt_dir) / f"g_{step:08d}"
    do_path = Path(ckpt_dir) / f"do_{step:08d}"
    save_pytree(g_path, {"generator": state.gen_params})
    save_pytree(do_path, {
        "mpd": state.mpd_params, "msd": state.msd_params,
        "msd_spectral": state.msd_spectral,
        "gen_opt": state.gen_opt, "disc_opt": state.disc_opt,
        "step": state.step, "epoch": state.epoch,
    })
    return g_path, do_path
