"""Dtype-policy coverage: the solver runs in bfloat16 and float64 too.

fp32 is the TPU-native default; bf16 halves memory/bandwidth at an accuracy
ceiling of ~eps_bf16·‖u‖ (mean-abs error ~1e-3-class on the reference
problem — useful as a preconditioner/initializer, not for tight tolerances);
f64 runs through XLA's emulation (slow on TPU, native on CPU).
"""

import jax
import jax.numpy as jnp
import pytest

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.solver import SolverConfig

PROBLEM = mg.REFERENCE_PROBLEM
PROG = mg.v_cycle(65, n_min=8, steps=3, coarse_option=0)


@pytest.mark.parametrize("dtype,ceiling", [
    # one V(3,3) cycle leaves ~8.5e-4 iteration error in every dtype;
    # bf16's representation ceiling happens to sit at the same scale here
    (jnp.bfloat16, 5e-3),
    (jnp.float32, 2e-3),
    (jnp.float64, 2e-3),
])
def test_both_engines_converge_per_dtype(dtype, ceiling):
    cfg = SolverConfig(dtype=dtype)
    rep = mg.solve(PROBLEM, PROG, cfg)
    assert rep.error_vs_analytic < ceiling

    cc = mg.compile_program(PROG, PROBLEM, cfg, donate=False)
    u, f = cc.init()
    u1, _ = cc(u, f)
    from multigrid_poisson_solver_tpu.ops.stencils import mean_abs_error

    ua = PROBLEM.analytic_grid(cc.finest_spec, jnp.float32)
    err = float(mean_abs_error(cc.unpad(u1).astype(jnp.float32), ua))
    assert err < ceiling


def test_pallas_kernels_trace_at_bf16():
    """Regression: every Pallas kernel must TRACE with a bf16 state. The
    from_zero closed-form sweep used a concrete jnp.float32 scalar, which
    promoted the stored value to f32 and failed JAX's ref-swap dtype check
    the first time a bf16 program hit the kernel path on real TPU (the
    XLA-fallback engines the CPU suite exercises never trace these)."""
    from multigrid_poisson_solver_tpu.ops import layout
    from multigrid_poisson_solver_tpu.ops import pallas_kernels as K

    n = 65
    rp, cp = layout.padded_shape(n)
    u = jnp.zeros((rp, cp), jnp.bfloat16)
    f = jnp.ones((rp, cp), jnp.bfloat16)
    cw = jnp.zeros((rp // 2 + 8, cp), jnp.bfloat16)
    h = 1.0 / (n - 1)

    outs = [
        K.fused_jacobi_padded(u, f, n, h, 3, from_zero=True, interpret=True),
        K.fused_jacobi_padded(u, f, n, h, 3, interpret=True),
        *K.fused_descend_padded(u, f, n, h, 3, want_err=True, interpret=True),
        *K.fused_ascend_padded(u, f, cw, n, h, 3, want_err=True,
                               interpret=True),
        K.residual_pallas(u, f, n, h, interpret=True),
        *K.fused_jacobi_errs_padded(u, f, n, h, 3, interpret=True),
    ]
    for o in jax.tree_util.tree_leaves(outs):
        assert o.dtype == jnp.bfloat16


def test_bf16_chaining_floors_far_above_fp32():
    """Chained bf16 cycles do NOT keep converging — corrections fall below
    bf16 resolution and iteration noise accumulates (measured: ~1e-2 after
    4 cycles vs fp32's ~6e-6). Documents that bf16 is a single-pass /
    preconditioner mode, not a deep-solve mode."""
    cfg = SolverConfig(dtype=jnp.bfloat16)
    rep = mg.solve(PROBLEM, mg.repeat(PROG, 4), cfg)
    assert rep.error_vs_analytic < 5e-2        # bounded, not divergent

    rep32 = mg.solve(PROBLEM, mg.repeat(PROG, 4), SolverConfig())
    assert rep32.error_vs_analytic < rep.error_vs_analytic / 10
