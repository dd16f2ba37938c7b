"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run anywhere (SURVEY.md §4 test strategy).

NOTE: this environment registers an `axon` TPU PJRT plugin via sitecustomize
and programmatically selects it (overriding the JAX_PLATFORMS env var), so
we must override the platform through jax.config *after* import — env vars
alone do not stick.  Tests always run on the virtual 8-CPU mesh; only
bench.py and the graft entry target the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# quick/full marker split (VERDICT r3 #10): `pytest -m quick` is the smoke
# suite (< 3 min); `-m full` selects only the slow tail.  The list below is
# every test measured >= ~6 s on the CPU mesh (pytest --durations, r4) —
# new tests default to quick until curated here.
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    "test_golden_images",
    "test_wide_rescue_path_matches",
    "test_gradients_wrt_materials_and_light",
    "test_integrator_pallas_accel_matches_wide",
    "test_pallas_stream_traversal_matches_resident",
    "test_two_process_distributed_render",
    "test_preview_modes_all_render",
    "test_train_step_reduces_loss",
    "test_engine_debug_and_wireframe_are_distinct_modes",
    "test_material_import_and_quirk",
    "test_config4_gradients",
    "test_session_progressive_and_observer_restart",
    "test_reference_quirks_mode_darker",
    "test_leaf_table_beyond_vmem_budget_streams",
    "test_sharded_render_matches_single_device",
    "test_mis_consistent_across_roughness",
    "test_pallas_shading_attrs_and_miss_finiteness",
    "test_config_renders",
    "test_pallas_traversal_matches_brute",
    "test_wide_low_occupancy_route_matches",
    "test_area_light_direct_matches_quadrature",
    "test_full_render_matches_expectation",
    "test_render_progressive_matches_render",
    "test_wide_matches_brute_force",
    "test_wide_mask_skips_rays",
    "test_config5_builds_with_lbvh",
    "test_pallas_anyhit_matches_brute",
    "test_energy_scales_linearly_with_light",
    "test_pallas_traversal_mask_skips_rays",
    "test_black_env_sphere_background",
    "test_emissive_visible_to_camera",
    "test_pallas_anyhit_t_max_and_mask",
    "test_engine_modes",
    "test_viewer_event_loop_restarts_accumulation",
    "test_normal_map_neutral_texture_matches_untextured",
    "test_directional_lambertian_analytic",
    "test_shade_attrs_packed_matches_unpacked",
    "test_estimator_comparison_modes_agree_in_expectation",
    "test_reuse_estimator_variance_pinned",
    "test_arena_overflow_fallback_matches_brute",
    "test_merged_leaf_widths_match_brute",
    "test_paged_worklist_matches_brute_multi_page",
    "test_preview_specular_ibl_metal_reflects_env",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "quick: fast smoke tests (< 3 min total)")
    config.addinivalue_line("markers", "full: slow tail (golden renders, rescue paths, multihost)")


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.full)
        else:
            item.add_marker(pytest.mark.quick)


# Duration guard (ADVICE r4): every test not hand-listed above defaults to
# the quick marker, so a newly added slow test would silently land in the
# < 3 min smoke suite.  Fail quick-marked tests that exceed the budget so
# the miscuration surfaces as a red test instead of a slow smoke run.
_QUICK_BUDGET_S = 20.0


import pytest as _pytest  # noqa: E402


@_pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    if (
        report.when == "call"
        and report.passed
        and call.duration > _QUICK_BUDGET_S
        and item.get_closest_marker("quick") is not None
    ):
        report.outcome = "failed"
        report.longrepr = (
            f"{item.nodeid}: took {call.duration:.1f}s but is marked "
            f"'quick' (budget {_QUICK_BUDGET_S:.0f}s). Add it to "
            "_SLOW_TESTS in tests/conftest.py."
        )
