"""3-D geometric multigrid scaffold (capability extension beyond the 2-D
reference).

The reference (cindytsai/multigrid_poisson_solver) is strictly 2-D; this
module demonstrates that the framework's design generalizes: the 7-point
stencil ops are the same roll/mask patterns as ops.stencils, transfer
operators stay separable (three 1-D passes), and a V-cycle composes them
recursively. Everything here is plain jittable jnp — XLA fuses the
elementwise stencils well in 3-D; the Pallas strip kernels' 2-D layout would
become slab tiling ((8, 128) tiles on the trailing two axes) when this grows
a production hot path.

Grids are vertex-centered (n, n, n) arrays over [0, 1]³ with Dirichlet
boundaries; hierarchies use the odd-halve rule n → (n+1)/2 (2:1 vertex
alignment, the same rule the 2-D fused kernels prefer).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _nb_sum3(u):
    """Sum of the six face neighbors for every interior point."""
    return (u[:-2, 1:-1, 1:-1] + u[2:, 1:-1, 1:-1]
            + u[1:-1, :-2, 1:-1] + u[1:-1, 2:, 1:-1]
            + u[1:-1, 1:-1, :-2] + u[1:-1, 1:-1, 2:])


def residual3(u, f, h: float):
    """r = ∇²u − f (7-point stencil) on the interior, 0 on the boundary."""
    inv_h2 = jnp.asarray(1.0 / (h * h), u.dtype)
    r = inv_h2 * (_nb_sum3(u) - 6.0 * u[1:-1, 1:-1, 1:-1]) - f[1:-1, 1:-1, 1:-1]
    return jnp.zeros_like(u).at[1:-1, 1:-1, 1:-1].set(r)


def jacobi_sweep3(u, f, h: float, omega: float = 0.857):
    """One damped Jacobi sweep (ω = 6/7 is the 3-D analog of the 2-D 0.8:
    it damps the highest-frequency checkerboard mode to |1 − 2ω| ≈ 5/7)."""
    h2 = jnp.asarray(h * h, u.dtype)
    incr = (_nb_sum3(u) - 6.0 * u[1:-1, 1:-1, 1:-1] - h2 * f[1:-1, 1:-1, 1:-1])
    return u.at[1:-1, 1:-1, 1:-1].add(jnp.asarray(omega / 6.0, u.dtype) * incr)


def restrict3(d, m: int):
    """2:1 full-weighting restriction (separable [¼,½,¼] then even sample),
    zero boundary — requires n == 2m − 1."""
    n = d.shape[0]
    if n != 2 * m - 1:
        raise ValueError(f"need n == 2m-1, got {n} -> {m}")

    def fw_axis(a, axis):
        lo = jnp.roll(a, 1, axis)
        hi = jnp.roll(a, -1, axis)
        return 0.25 * lo + 0.5 * a + 0.25 * hi

    s = fw_axis(fw_axis(fw_axis(d, 0), 1), 2)
    out = s[::2, ::2, ::2]
    z = jnp.zeros_like(out)
    mask = jnp.zeros((m, m, m), bool).at[1:-1, 1:-1, 1:-1].set(True)
    return jnp.where(mask, out, z)


def prolong3(uc, n: int):
    """2:1 trilinear prolongation (separable linear interpolation)."""
    m = uc.shape[0]
    if n != 2 * m - 1:
        raise ValueError(f"need n == 2m-1, got {m} -> {n}")

    def expand_axis(a, axis):
        # even fine points copy; odd points average neighbors
        mvd = jnp.moveaxis(a, axis, 0)
        odd = 0.5 * (mvd[:-1] + mvd[1:])
        out = jnp.zeros((2 * mvd.shape[0] - 1,) + mvd.shape[1:], a.dtype)
        out = out.at[::2].set(mvd).at[1::2].set(odd)
        return jnp.moveaxis(out, 0, axis)

    return expand_axis(expand_axis(expand_axis(uc, 0), 1), 2)


@dataclasses.dataclass(frozen=True)
class Problem3D:
    """∇²u = f on [0,1]³ with Dirichlet boundary."""

    source: Callable
    boundary: Optional[Callable] = None
    analytic: Optional[Callable] = None
    name: str = "custom3d"

    def _grid(self, fn, n: int, dtype):
        x = jnp.linspace(0.0, 1.0, n, dtype=dtype)
        X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
        return fn(X, Y, Z).astype(dtype)

    def source_grid(self, n, dtype=jnp.float32):
        return self._grid(self.source, n, dtype)

    def boundary_grid(self, n, dtype=jnp.float32):
        if self.boundary is None:
            return jnp.zeros((n, n, n), dtype)
        g = self._grid(self.boundary, n, dtype)
        mask = jnp.zeros((n, n, n), bool).at[1:-1, 1:-1, 1:-1].set(True)
        return jnp.where(mask, jnp.zeros_like(g), g)

    def analytic_grid(self, n, dtype=jnp.float32):
        assert self.analytic is not None
        return self._grid(self.analytic, n, dtype)


# manufactured 3-D analog of the reference's 2-D problem
REFERENCE_PROBLEM_3D = Problem3D(
    source=lambda x, y, z: -3.0 * (2 * jnp.pi) ** 2
    * jnp.sin(2 * jnp.pi * x) * jnp.sin(2 * jnp.pi * y)
    * jnp.sin(2 * jnp.pi * z),
    analytic=lambda x, y, z: jnp.sin(2 * jnp.pi * x)
    * jnp.sin(2 * jnp.pi * y) * jnp.sin(2 * jnp.pi * z),
    name="sine3d",
)


def _sizes(n_max: int, n_min: int) -> list[int]:
    sizes = [n_max]
    while sizes[-1] > n_min and (sizes[-1] + 1) % 2 == 0 and sizes[-1] >= 5:
        m = (sizes[-1] + 1) // 2
        if m < n_min or m == sizes[-1]:
            break
        sizes.append(m)
    return sizes


@partial(jax.jit, static_argnames=("h", "n_min", "pre", "post",
                                   "coarse_sweeps", "omega", "kernels"))
def v_cycle3(u, f, h: float, n_min: int = 5, pre: int = 2, post: int = 2,
             coarse_sweeps: int = 50, omega: float = 0.857,
             kernels: str = "xla"):
    """One recursive 3-D V-cycle (coarsest level relaxed to convergence).

    ``kernels="pallas"`` runs the smoothing passes and the residual through
    the brick-streamed fused kernels (ops.pallas3d) on levels large enough
    to benefit; transfers stay XLA (separable rolls — not the hot path).
    """
    n = u.shape[0]
    sizes = _sizes(n, n_min)
    if kernels == "pallas":
        from ..ops import pallas3d as _p3k
        interp = jax.default_backend() != "tpu"

    def smooth(u, f, h, k):
        if kernels == "pallas" and u.shape[0] >= 65 and k >= 1:
            while k > 0:
                kk = min(k, _p3k.MAX_FUSED_SWEEPS_3D)
                up = _p3k.fused_jacobi3_padded(
                    _p3k.pad_grid3(u), _p3k.pad_grid3(f), u.shape[0], h,
                    kk, omega=omega, interpret=interp)
                u = _p3k.unpad_grid3(up, u.shape[0])
                k -= kk
        for _ in range(k):
            u = jacobi_sweep3(u, f, h, omega)
        return u

    def neg_residual(u, f, h):
        if kernels == "pallas" and u.shape[0] >= 65:
            rp = _p3k.residual3_pallas(
                _p3k.pad_grid3(u), _p3k.pad_grid3(f), u.shape[0], h,
                negate=True, interpret=interp)
            return _p3k.unpad_grid3(rp, u.shape[0])
        return -residual3(u, f, h)

    def run(u, f, h, depth):
        n = u.shape[0]
        if depth == len(sizes) - 1:
            return smooth(u, f, h, coarse_sweeps)
        u = smooth(u, f, h, pre)
        m = sizes[depth + 1]
        fc = restrict3(neg_residual(u, f, h), m)
        ec = run(jnp.zeros((m, m, m), u.dtype), fc, 2 * h, depth + 1)
        u = u + prolong3(ec, n)
        u = u.at[0].set(0).at[-1].set(0)  # prolongation keeps bounds 0 anyway
        return smooth(u, f, h, post)

    return run(u, f, h, 0)


def solve3(problem: Problem3D, n: int, cycles: int = 10,
           dtype=jnp.float32, kernels: str = "xla"):
    """Chained 3-D V-cycles; returns (u, mean |u − analytic| if available)."""
    h = 1.0 / (n - 1)
    f = problem.source_grid(n, dtype) + problem.boundary_grid(n, dtype)
    u = problem.boundary_grid(n, dtype)

    @jax.jit
    def iterate(u, f):
        return jax.lax.fori_loop(
            0, cycles, lambda i, v: v_cycle3(v, f, h, kernels=kernels), u)

    u = iterate(u, f)
    err = None
    if problem.analytic is not None:
        err = float(jnp.mean(jnp.abs(u - problem.analytic_grid(n, dtype))))
    return u, err
