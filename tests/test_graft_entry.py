"""Driver-facing entry points: dryrun_multichip on the virtual mesh and the
entry() contract (fn + example args, jittable)."""

import sys

import numpy as np
import pytest


def test_dryrun_multichip_small():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(4)  # 2x2 dp x tp on the virtual CPU mesh


@pytest.mark.slow
def test_entry_contract():
    sys.path.insert(0, "/root/repo")
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    assert len(args) == 5  # (s1_vars, voc_params, video, mask, spk)
    video = args[2]
    assert video.shape[1:] == (48, 88, 88, 1)
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 48 * 640)
    assert np.isfinite(np.asarray(out)).all()
