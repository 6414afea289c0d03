"""Data-parallel serving: mesh-sharded pipeline == single-device pipeline."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lip2speech_tpu.core.config import preset  # noqa: E402
from lip2speech_tpu.parallel.mesh import make_mesh  # noqa: E402
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline  # noqa: E402


def test_mesh_serving_matches_single_device():
    cfg = preset("tiny")
    ref = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=8)
    mesh = make_mesh()  # 8 CPU devices on 'data'
    par = Lip2SpeechPipeline(cfg, ref.stage1_variables, ref.vocoder_params,
                             mesh=mesh)

    rng = np.random.default_rng(0)
    b, t = 5, 8                     # ragged batch: padded up to 8 rows
    video = rng.standard_normal((b, t, 88, 88, 1)).astype(np.float32)
    mask = np.ones((b, t), bool)
    mask[3, 6:] = False
    spk = rng.standard_normal((b, 256)).astype(np.float32)

    r_ref = ref.synthesise_batch(video, mask, spk)
    r_par = par.synthesise_batch(video, mask, spk)
    assert len(r_par) == b == len(r_ref)
    for a, c in zip(r_ref, r_par):
        np.testing.assert_array_equal(a.units, c.units)
        np.testing.assert_allclose(a.wav, c.wav, atol=2e-5)
        np.testing.assert_allclose(a.mel, c.mel, atol=2e-5)


def test_mesh_serving_admits_fused_tail():
    """The mesh path runs the e2e program through shard_map, so the
    fused-tail pallas_call is legal inside it (bare GSPMD in_shardings
    cannot partition a custom call). Mesh + fused == single-device + fused,
    including via the post-hoc set_mesh() the server's --data-parallel
    uses."""
    import dataclasses

    cfg = preset("tiny")
    cfg = dataclasses.replace(
        cfg, vocoder=dataclasses.replace(cfg.vocoder, fused_tail_kernel=True))
    mesh = make_mesh()

    ref = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=8)
    assert ref.vocoder.cfg.fused_tail_kernel           # config opted in

    post = Lip2SpeechPipeline(cfg, ref.stage1_variables, ref.vocoder_params)
    post.set_mesh(mesh)
    assert post.vocoder.cfg.fused_tail_kernel and post.mesh is mesh

    rng = np.random.default_rng(1)
    b, t = 3, 8
    video = rng.standard_normal((b, t, 88, 88, 1)).astype(np.float32)
    mask = np.ones((b, t), bool)
    spk = rng.standard_normal((b, 256)).astype(np.float32)
    r_ref = ref.synthesise_batch(video, mask, spk)
    r_par = post.synthesise_batch(video, mask, spk)
    for a, c in zip(r_ref, r_par):
        np.testing.assert_array_equal(a.units, c.units)
        np.testing.assert_allclose(a.wav, c.wav, atol=2e-5)
