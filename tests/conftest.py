"""Test configuration: run everything on a virtual 8-device CPU mesh.

In this environment jax is pre-imported at interpreter startup with a TPU
plugin that ignores JAX_PLATFORMS, so plain env vars are too late. Instead we
flip the platform with ``jax.config.update`` (honored post-import) and extend
XLA_FLAGS before the lazily-created CPU client first initializes.

float64 is enabled so oracle tests can compare against numpy references at
full precision; library code never assumes x64.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- default-loop taming (VERDICT r3 weak 4) --------------------------------
# Everything measured >10 s on the 4-core box is marked `slow` here (one
# place, param-granular) so `-m "not slow"` is a fast default loop. Every
# kernel/engine FAMILY keeps at least one fast bit-match/parity
# representative in the default set — the marked ids below are the heavier
# grids/params of families that are still covered by a cheaper sibling
# (e.g. Wcycle parity is slow, test/Vcycle/VcycleTrigger parity stay;
# [3-rows-1d] sharded-engine bit-match stays, the other three policies are
# slow). Durations: `pytest --durations=150` full-run log, 2026-08-20.

# whole functions (every param >10 s)
_SLOW_FUNCS = frozenset({
    "test_pallas3d.py::test_trigger3_vmem_bitmatches_per_pass_loop",
    "test_rdma.py::test_compiled_engine_rdma_halo_matches",
    "test_block_partition.py::test_fmg_block_sharded_matches_single",
    "test_compiled3.py::test_pallas_trigger_fast_path_consistency",
    "test_refine3.py::test_refine3_checkpoint_resume",
    "test_orbax_checkpoint.py::test_refine3_resume_through_orbax",
    "test_refine.py::test_tw32_checkpoint_resume_keeps_all_words",
    "test_refine.py::test_bf16_inner_cycles_converge",
    "test_refine.py::test_full_weighting_matches_manual",
    "test_pallas_chain.py::test_compiled_trigger_routes_through_vmem_kernel",
    "test_pallas_chain.py::test_compiled_engine_chains_and_bitmatches",
    "test_pallas_chain.py::test_compiled_engine_chain_err_semantics",
    "test_pallas_shard.py::test_sharded_trigger_batch_matches_unbatched",
    "test_rdma.py::test_compiled3_engine_rdma_trigger_routes",
    # round-5 additions (durations from the -n 4 loop, 2026-08-20):
    # the 2-D auto test (18.8 s) is the family's fast representative
    "test_compiled3.py::test_trigger_auto_batch3",              # 130.8 s
    # legs_route (23 s) stays: it covers both legs + whole-cycle bit-match
    "test_rdma.py::test_compiled3_engine_rdma_smoother_routes",  # 25.7 s
    "test_scaling_model3.py::test_model_matches_lowered_collectives_deep",
})

# single parametrizations (their siblings are fast and stay default)
_SLOW_IDS = frozenset({
    "test_reference_parity.py::test_final_error_matches_reference[Wcycle.txt]",
    "test_pallas_shard.py::test_compiled_pallas_sharded_matches_xla[3-block-2d]",
    "test_pallas_shard.py::test_compiled_pallas_sharded_matches_xla[-1-block-2d]",
    "test_pallas_shard.py::test_compiled_pallas_sharded_matches_xla[-1-rows-1d]",
    "test_pallas_shard.py::test_compiled_pallas_sharded_aligned_uses_fused_legs[rows-1d]",
    "test_pallas_shard.py::test_sharded_trigger_no_xla_error_pass[block-2d]",
    "test_pallas_chain.py::test_descend_chain_bitmatches_per_level[sampling]",
    "test_pallas_shard3.py::test_v_cycle3_sharded_matches_single_device[129]",
    "test_pallas_shard3.py::test_v_cycle3_sharded_matches_single_device[65]",
    "test_pallas_shard3.py::test_sharded_legs_multi_brick_clipped[3]",
    "test_dtypes.py::test_both_engines_converge_per_dtype[bfloat16-0.005]",
    "test_pallas3d.py::test_fused_jacobi3_residual_multi_brick[None]",
    "test_pallas.py::test_fused_descend_matches_separate_ops[True-full_weighting-1031-6]",
    "test_pallas.py::test_fused_error_matches_separate_metric[True-1030-7]",
    "test_pallas.py::test_fused_error_matches_separate_metric[gpu-1030-8]",
    "test_compiled.py::test_compiled_matches_interpreted[<lambda>2]",
    "test_padded3.py::test_prolong3_add_p_matches_oracle[9]",
    # [gpu] stays: the 3-D whole-loop RDMA family's fast bit-match rep
    "test_rdma.py::test_rdma_trigger3_bitmatches_per_pass[clean]",
    # round 5: [3-clean] (23 s) stays as the RDMA-smoother3 bit-match rep
    "test_rdma.py::test_rdma_smoother3_bitmatches_ppermute[11-clean]",
    "test_rdma.py::test_rdma_smoother3_bitmatches_ppermute[5-gpu]",
    # [4] (17 s) stays as the sharded-batch rep; auto is covered unsharded
    "test_compiled3_policy.py::test_sharded_trigger_batch3[auto]",
})


def pytest_collection_modifyitems(items):
    for item in items:
        nodeid = item.nodeid.split("/")[-1]          # strip tests/ prefix
        func = nodeid.split("[")[0]
        if nodeid in _SLOW_IDS or func in _SLOW_FUNCS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _hang_guard():
    """Best-effort watchdog: the Pallas TPU interpreter has a known
    timing-dependent cross-device-callback deadlock (documented in
    tests/test_rdma.py) — if it ever resurfaces, fail the one test after
    10 minutes instead of hanging the whole suite. Python-level waits
    (threading.Condition) are signal-interruptible in the main thread;
    C-level blocks may not be, so this is a net, not a guarantee."""
    import signal

    if not hasattr(signal, "SIGALRM"):
        yield
        return

    def _raise(signum, frame):
        raise TimeoutError("test exceeded the 600 s hang guard "
                           "(tests/conftest.py::_hang_guard)")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(600)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
