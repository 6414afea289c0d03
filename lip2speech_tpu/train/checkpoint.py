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
