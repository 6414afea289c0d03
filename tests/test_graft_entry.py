"""Driver-facing entry points: dryrun_multichip on the virtual mesh and the
entry() contract (fn + example args, jittable)."""

import sys

import numpy as np
import pytest


def test_dryrun_multichip_small():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    # 8 devices (4x2 dp x tp) — matching the conftest device count, so the
    # clear_backends + jax_num_cpu_devices reconfiguration inside the dryrun
    # does not shrink the mesh for every later test in this process
    g.dryrun_multichip(8)


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
