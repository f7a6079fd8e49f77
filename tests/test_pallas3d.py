"""3-D Pallas brick-streaming kernels vs the models.poisson3d oracle.

All cases run in interpret mode on CPU (conftest forces the cpu platform);
the TPU hardware validation lives in BASELINE.md. The small-budget cases
monkeypatch the VMEM budget so brick decomposition (num_zb, num_rb > 1) is
exercised at n=33 instead of n≥129.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.ops import pallas3d as p3k

OMEGA3 = 6.0 / 7.0


def _mk(n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((n, n, n), np.float32)
    u[1:-1, 1:-1, 1:-1] = rng.standard_normal((n - 2,) * 3).astype(np.float32)
    f = rng.standard_normal((n,) * 3).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(f)


def _sweeps(u, f, h, k):
    for _ in range(k):
        u = p3.jacobi_sweep3(u, f, h, omega=OMEGA3)
    return u


def test_brick_geometry_invariants():
    for n in (33, 129, 513):
        nz, rp, cp = p3k.padded_shape3(n)
        assert rp % 16 == 0 and cp % 128 == 0 and nz == n
        for z_halo, nb in ((8, 5.0), (1, 6.0)):
            zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4, z_halo, nb)
            assert rs % 8 == 0 and orow % 8 == 0
            assert 1 <= oz <= zs <= nz and orow <= rs <= rp
            if zs < nz:
                assert oz == zs - 2 * z_halo
            if rs < rp:
                assert orow == rs - 16


def test_residual3_matches_oracle():
    n, h = 33, 1.0 / 32
    u, f = _mk(n)
    up, fp = p3k.pad_grid3(u), p3k.pad_grid3(f)
    got = p3k.unpad_grid3(
        p3k.residual3_pallas(up, fp, n, h, interpret=True), n)
    want = p3.residual3(u, f, h)
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) < 1e-6 * scale
    gotn = p3k.unpad_grid3(
        p3k.residual3_pallas(up, fp, n, h, negate=True, interpret=True), n)
    assert float(jnp.abs(gotn + want).max()) < 1e-6 * scale


@pytest.mark.parametrize("steps", [1, 2, 8])
def test_fused_jacobi3_matches_oracle(steps):
    n, h = 33, 1.0 / 32
    u, f = _mk(n, seed=steps)
    got = p3k.unpad_grid3(
        p3k.fused_jacobi3_padded(p3k.pad_grid3(u), p3k.pad_grid3(f), n, h,
                                 steps, interpret=True), n)
    want = _sweeps(u, f, h, steps)
    assert float(jnp.abs(got - want).max()) < 1e-5


@pytest.mark.parametrize("steps", [1, 3])
def test_fused_jacobi3_from_zero(steps):
    n, h = 33, 1.0 / 32
    _, f = _mk(n, seed=10 + steps)
    got = p3k.unpad_grid3(
        p3k.fused_jacobi3_padded(jnp.zeros(p3k.padded_shape3(n), f.dtype),
                                 p3k.pad_grid3(f), n, h, steps,
                                 from_zero=True, interpret=True), n)
    want = _sweeps(jnp.zeros((n, n, n), f.dtype), f, h, steps)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_multi_brick_decomposition(monkeypatch):
    """A small VMEM budget forces num_zb > 1 AND num_rb > 1 at n=33."""
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_BYTES", 600_000)
    n, h = 33, 1.0 / 32
    nz, rp, cp = p3k.padded_shape3(n)
    zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4, z_halo=2)
    assert zs < nz and rs < rp  # the point of this test

    u, f = _mk(n, seed=7)
    got = p3k.unpad_grid3(
        p3k.fused_jacobi3_padded(p3k.pad_grid3(u), p3k.pad_grid3(f), n, h, 2,
                                 interpret=True), n)
    want = _sweeps(u, f, h, 2)
    assert float(jnp.abs(got - want).max()) < 1e-5

    got = p3k.unpad_grid3(
        p3k.residual3_pallas(p3k.pad_grid3(u), p3k.pad_grid3(f), n, h,
                             interpret=True), n)
    want = p3.residual3(u, f, h)
    assert (float(jnp.abs(got - want).max())
            < 1e-6 * float(jnp.abs(want).max()))


def test_v_cycle3_pallas_matches_xla():
    """kernels="pallas" routes finest-level smoothing + residual through the
    brick kernels; the cycle must match the XLA path to fp32 roundoff."""
    n, h = 65, 1.0 / 64
    u, f = _mk(n, seed=3)
    a = p3.v_cycle3(u, f, h, pre=2, post=2, coarse_sweeps=10)
    b = p3.v_cycle3(u, f, h, pre=2, post=2, coarse_sweeps=10,
                    kernels="pallas")
    assert float(jnp.abs(a - b).max()) < 1e-5 * float(jnp.abs(a).max() + 1)


def test_bf16_traces():
    n, h = 33, 1.0 / 32
    u = jnp.zeros(p3k.padded_shape3(n), jnp.bfloat16)
    f = jnp.ones(p3k.padded_shape3(n), jnp.bfloat16)
    outs = [p3k.fused_jacobi3_padded(u, f, n, h, 2, interpret=True),
            p3k.residual3_pallas(u, f, n, h, interpret=True)]
    for o in outs:
        assert o.dtype == jnp.bfloat16
