"""Test configuration: force the CPU backend with 8 virtual devices.

The multi-chip sharding path is validated on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``), the strategy SURVEY.md §4 calls for
in place of the reference's (absent) distributed tests. The axon sitecustomize
registers the TPU plugin and pins ``jax_platforms`` at import time, so we
override via ``jax.config`` (the env var alone is not honored).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

#: Tests measured >4.5 s on the CPU backend (full-suite --durations run,
#: round 4: 613 s total for 242 tests). The default profile (pyproject
#: addopts -m "not slow") skips them for a <5-minute iteration loop; CI and
#: pre-release runs use the FULL suite: pytest -m "slow or not slow".
#: Three cheap sentinels stay fast on purpose so the default profile still
#: exercises a kernel-pair forward, an FD gradient check, and the boundary
#: (edge) estimator: test_persist_forward_matches_twin,
#: test_grad_albedo_matches_fd, test_edge_center_gradient_matches_fd.
SLOW_TESTS = {
    "test_edge_signed_radius_hollow_glass",
    "test_edge_remat_chunks_matches_plain",
    "test_fit_scene_fuzz_channel_descends",
    "test_elastic_train_step_survives_device_fault",
    "test_elastic_train_step_descends",
    "test_elastic_train_step_bitwise_placement_invariance",
    "test_fit_scene_edge_ad_descends_geometry",
    "test_edge_primal_bitwise_matches_keyed_trace",
    "test_edge_handles_metal_and_auto_sigma",
    "test_edge_radius_gradient_sign",
    "test_elastic_survives_persistent_device_fault",
    "test_persist_rec_attrs_off_bitwise_equal",
    "test_remat_passes_auto_and_fd",
    "test_persist_vjp_matches_twin_autodiff",
    "test_persist_replay_fused_matches_loop",
    "test_elastic_concurrent_scaling_and_bitwise_invariance",
    "test_strided_k_exceeds_pixels_per_lane_budget",
    "test_persist_tail_compact_matches_twin",
    "test_persist_tail_compact_nonaligned_rows",
    "test_persist_multistrip_forward_and_vjp",
    "test_two_process_distributed_render_and_train",
    "test_elastic_transient_fault_retries_in_place",
    "test_sharded_train_step_runs_and_reduces",
    "test_fused_vjp_matches_twin_autodiff",
    "test_twin_ad_canary_agrees",
    "test_staged_fd_self_consistency_albedo",
    "test_fit_scene_descends_and_recovers",
    "test_strided_k_invariance",
    "test_sharded_train_step_fused_grad_mode",
    "test_staged_radiance_statistical",
    "test_recorded_matches_remat_gradients",
    "test_persist_mat_and_key_not_differentiated",
    "test_staged_vjp_matches_twin_autodiff",
    "test_strided_sample_offset_chunking",
    "test_elastic_clean_run_matches_plain",
    "test_grad_recorded_staged_matches_fd",
    "test_sharded_persistent_strided_dispatch",
    "test_fit_scene_scan_descends",
    "test_fused_forward_matches_twin",
    "test_persist_overflow_contract",
    "test_strided_sample_groups_equivalence",
    "test_fused_mat_and_key_not_differentiated",
    "test_hwprng_branches_trace",
    "test_fused_diffuse_statistical",
    "test_strided_statistical",
    "test_staged_single_stage_equals_unstaged",
    "test_strided_pixel_start_tiles_match_full",
    "test_fused_mirror_exact",
    "test_strided_pixel_start_statistical_multisample",
    "test_inline_sample_chunking_statistical",
    "test_mega_statistical",
    "test_fused_glass_energy",
}


def pytest_collection_modifyitems(config, items):
    # Tests requested explicitly by node ID must RUN even under the default
    # `-m "not slow"` profile — otherwise `pytest tests/x.py::test_slow`
    # reports "1 deselected" and exits green without running anything
    # (round-4 review finding). Skip marking exactly those.
    # Normalize args to rootdir-relative node IDs so invoking pytest from a
    # subdirectory or with an absolute path still matches item.nodeid
    # (ADVICE r4: verbatim comparison silently deselected the requested
    # test whenever the arg spelling differed from the nodeid).
    explicit = set()
    for a in config.args:
        if "::" not in a:
            continue
        path, sep, rest = a.partition("::")
        try:
            rel = os.path.relpath(os.path.abspath(path),
                                  str(config.rootpath))
        except ValueError:  # different drive on Windows
            rel = path
        explicit.add(rel.replace(os.sep, "/") + sep + rest)

    def explicitly_requested(item):
        nid = item.nodeid
        return any(nid == e or nid.startswith(e + "[") for e in explicit)

    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS \
                and not explicitly_requested(item):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Full-suite runs (232+ tests, one process) reproducibly segfault the
    XLA CPU compiler around the ~136th test (backend_compile_and_load, both
    round-4 attempts, same site) while every half-prefix passes — an
    accumulation failure, not a specific-test bug. Dropping the compiled-
    program caches between modules keeps the per-process compiler state
    bounded; per-module recompiles cost little since tests rarely share
    programs across files."""
    yield
    jax.clear_caches()
