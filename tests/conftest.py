"""Test configuration: force an 8-device virtual CPU mesh.

Real TPU hardware is single-chip in this environment; multi-chip sharding is
validated on virtual CPU devices (SURVEY.md §4 implication).

Note: the environment's sitecustomize imports jax and registers the axon TPU
backend at interpreter start, so JAX_PLATFORMS env tweaks are too late — we
must use jax.config.update before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compilation cache: the suite is compile-dominated, and the
# same tiny-model programs recompile on every run without this
jax.config.update("jax_compilation_cache_dir", "/tmp/jax-test-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/datasets/lrs3"

# Fast smoke tier (VERDICT r3 next #6): `pytest -m smoke` runs in <5 min
# cold-cache and covers the load-bearing paths — graft entry, the fused
# vocoder tail (parity + serve-time fallback), loss/decode equivalence, one
# real-oracle parity per model family, the e2e pipeline, and the batched
# serving gateway. Files listed here get the marker on all their non-slow
# tests; SMOKE_EXCLUDE drops individually expensive cases:
#   test_discriminators_run_and_losses    54 s alone
#   test_dryrun_multichip_small           ~240 s warm / ~400 s cold (8-dev
#     SPMD compiles); the driver re-validates exactly this path every round
#     via __graft_entry__.dryrun_multichip -> MULTICHIP_r0N.json, so smoke
#     dropping it loses no unique coverage (VERDICT r4 next #7)
SMOKE_FILES = {
    "test_graft_entry.py",
    "test_fused_tail.py",
    "test_losses_decode.py",
    "test_conformer_parity.py",
    "test_vocoder_parity.py",
    "test_pipeline_e2e.py",
    "test_server_batched.py",
}
#   test_generator_flag_is_transparent    ~26 s warm (whole-generator
#     equivalence sweep; the per-stage parity + serve-time fallback smoke
#     members already cover the fused-tail kernel's correctness surface)
SMOKE_EXCLUDE = {"test_discriminators_run_and_losses",
                 "test_dryrun_multichip_small",
                 "test_generator_flag_is_transparent"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.fspath.basename in SMOKE_FILES
                and "slow" not in item.keywords
                and item.name.split("[")[0] not in SMOKE_EXCLUDE):
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def lrs3_sample_dir():
    import pathlib

    p = pathlib.Path(REFERENCE_DATA)
    if not p.exists():
        pytest.skip("bundled LRS3 sample data not available")
    return p


@pytest.fixture(autouse=True)
def _reset_kernel_meshes():
    """The train-step builders declare their mesh for the Pallas kernels'
    self-shard_map (set_flash_mesh / set_fused_tail_mesh) as a process-wide
    setting; reset after each test so mesh-step tests don't leak wrapping
    into unrelated kernel tests."""
    yield
    import sys

    fa = sys.modules.get("lip2speech_tpu.ops.pallas_rel_attention")
    if fa is not None:
        fa.set_flash_mesh(None)
    ft = sys.modules.get("lip2speech_tpu.ops.pallas_fused_tail")
    if ft is not None:
        ft.set_fused_tail_mesh(None)
