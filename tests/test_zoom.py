"""Zoom (restriction/prolongation) vs a direct numpy port of the reference formulas."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_poisson_solver_tpu.ops import prolongate, restrict_residual, zoom


def np_restriction(u_f, m):
    """Direct transcription of the reference's fractional-weight restriction
    (doRestriction, MG_solver_CPU.cpp:640-680): interior coarse points sample
    the fine grid bilinearly; coarse boundary forced to 0."""
    n = u_f.shape[0]
    h_f = 1.0 / (n - 1)
    h_c = 1.0 / (m - 1)
    u_c = np.zeros((m, m), dtype=u_f.dtype)
    for iy_c in range(1, m - 1):
        for ix_c in range(1, m - 1):
            ix_f = int(math.floor(ix_c * h_c / h_f))
            iy_f = int(math.floor(iy_c * h_c / h_f))
            a = math.fmod(ix_c * h_c, h_f) / h_f
            c = math.fmod(iy_c * h_c, h_f) / h_f
            b, d = 1.0 - a, 1.0 - c
            u_c[iy_c, ix_c] = (
                b * d * u_f[iy_f, ix_f]
                + a * d * u_f[iy_f, ix_f + 1]
                + c * b * u_f[iy_f + 1, ix_f]
                + a * c * u_f[iy_f + 1, ix_f + 1]
            )
    return u_c


def np_bilinear_sample(src, m):
    """Align-corners bilinear resample of the full grid (prolongation semantics)."""
    n = src.shape[0]
    out = np.zeros((m, m), dtype=src.dtype)
    scale = (n - 1) / (m - 1)
    for iy in range(m):
        for ix in range(m):
            sy, sx = iy * scale, ix * scale
            i0 = min(int(math.floor(sy)), n - 2)
            j0 = min(int(math.floor(sx)), n - 2)
            wy, wx = sy - i0, sx - j0
            out[iy, ix] = (
                (1 - wy) * ((1 - wx) * src[i0, j0] + wx * src[i0, j0 + 1])
                + wy * ((1 - wx) * src[i0 + 1, j0] + wx * src[i0 + 1, j0 + 1])
            )
    return out


def test_zoom_identity(rng):
    u = rng.random((9, 9))
    np.testing.assert_array_equal(np.asarray(zoom(jnp.asarray(u), 9)), u)


@pytest.mark.parametrize("n,m", [(16, 8), (17, 9), (33, 9), (12, 7)])
def test_restriction_matches_reference_formula(rng, n, m):
    d = rng.random((n, n))
    got = np.asarray(restrict_residual(jnp.asarray(d), m))
    np.testing.assert_allclose(got, np_restriction(-d, m), rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("n,m", [(8, 16), (9, 17), (9, 33), (7, 12)])
def test_prolongation_matches_bilinear_sampling(rng, n, m):
    u_c = rng.random((n, n))
    # zero Dirichlet boundary, like real multigrid corrections
    u_c[0, :] = u_c[-1, :] = u_c[:, 0] = u_c[:, -1] = 0.0
    got = np.asarray(prolongate(jnp.asarray(u_c), m))
    np.testing.assert_allclose(got, np_bilinear_sample(u_c, m), rtol=1e-12, atol=1e-13)
    # zero coarse boundary implies zero fine boundary
    assert np.allclose(got[0, :], 0) and np.allclose(got[:, -1], 0)


def test_nested_restriction_is_injection(rng):
    """With exactly nested grids (n = 2m - 1) coarse points coincide with fine
    points, so the bilinear weights collapse to pure injection."""
    n, m = 17, 9
    d = rng.random((n, n))
    got = np.asarray(restrict_residual(jnp.asarray(d), m))
    np.testing.assert_allclose(got[1:-1, 1:-1], -d[2:-2:2, 2:-2:2], rtol=1e-12)


def test_zoom_matmuls_request_highest_precision():
    """TPU matmuls round inputs to bf16 unless precision=HIGHEST is requested;
    the oracle zoom feeds the interpreted engine's transfer operators, so its
    dot_generals must carry the HIGHEST annotation (VERDICT r1 weak #6)."""
    import jax

    jaxpr = jax.make_jaxpr(lambda x: zoom(x, 9))(jnp.zeros((17, 17), jnp.float32))
    dots = [
        e
        for e in jaxpr.jaxpr.eqns[0].params["jaxpr"].jaxpr.eqns
        if e.primitive.name == "dot_general"
    ] or [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "zoom no longer lowers through dot_general — update this test"
    for e in dots:
        assert e.params["precision"] == (
            jax.lax.Precision.HIGHEST,
            jax.lax.Precision.HIGHEST,
        )


def test_prolongation_exact_on_linear_functions():
    """Bilinear interpolation reproduces bilinear functions exactly."""
    n, m = 9, 21
    x = np.linspace(0, 1, n)
    xf = np.linspace(0, 1, m)
    u_c = np.add.outer(2 * x, 3 * x)  # u = 2y + 3x, linear
    got = np.asarray(zoom(jnp.asarray(u_c), m))
    expect = np.add.outer(2 * xf, 3 * xf)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)
