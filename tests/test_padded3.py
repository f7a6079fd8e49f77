"""Padded-layout 3-D transfer operators vs the plain-jnp oracles."""

import jax
import jax.numpy as jnp
import pytest

from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.ops import padded3 as pd3
from multigrid_poisson_solver_tpu.ops.pallas3d import (pad_grid3,
                                                       padded_shape3,
                                                       unpad_grid3)


def _mk(n, seed=0, dtype=jnp.float32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    mask = jnp.zeros((n,) * 3, dtype).at[1:-1, 1:-1, 1:-1].set(1.0)
    return (jax.random.normal(k1, (n,) * 3, dtype) * mask,
            jax.random.normal(k2, (n,) * 3, dtype) * mask)


@pytest.mark.parametrize("n", [9, 33, 129])
def test_restrict3_p_matches_oracle(n):
    m = (n + 1) // 2
    d, _ = _mk(n)
    got = unpad_grid3(pd3.restrict3_p(pad_grid3(d), n, m), m)
    want = p3.restrict3(d, m)
    assert float(jnp.abs(got - want).max()) < 1e-6


@pytest.mark.parametrize("n", [9, 33, 129])
def test_restrict3_p_padding_stays_zero(n):
    m = (n + 1) // 2
    d, _ = _mk(n)
    out = pd3.restrict3_p(pad_grid3(d), n, m)
    core = pad_grid3(unpad_grid3(out, m))
    assert float(jnp.abs(out - core).max()) == 0.0


@pytest.mark.parametrize("n", [9, 33, 129])
def test_prolong3_add_p_matches_oracle(n):
    m = (n + 1) // 2
    u, _ = _mk(n, seed=1)
    c, _ = _mk(m, seed=2)
    got = unpad_grid3(pd3.prolong3_add_p(pad_grid3(u), pad_grid3(c), n, m), n)
    want = u + p3.prolong3(c, n)
    assert float(jnp.abs(got - want).max()) < 1e-6


def test_prolong3_add_p_padding_stays_zero():
    n, m = 33, 17
    u, _ = _mk(n, seed=1)
    c, _ = _mk(m, seed=2)
    out = pd3.prolong3_add_p(pad_grid3(u), pad_grid3(c), n, m)
    core = pad_grid3(unpad_grid3(out, n))
    assert float(jnp.abs(out - core).max()) == 0.0


def test_shape_validation():
    with pytest.raises(ValueError):
        pd3.restrict3_p(jnp.zeros(padded_shape3(9)), 9, 4)
    with pytest.raises(ValueError):
        pd3.prolong3_add_p(jnp.zeros(padded_shape3(9)),
                           jnp.zeros(padded_shape3(4)), 9, 4)
