"""Problem definitions: source term, Dirichlet boundary, and (optional) analytic solution.

The reference hardcodes a single manufactured problem ("Problem Dependent",
/root/reference/README.md:272; getSource/getBoundary/getAnalytic at
MG_solver_CPU.cpp:468-548). Here problems are first-class pluggable objects:
a :class:`Problem` bundles callables evaluated on grid coordinates, so users can
solve arbitrary Poisson problems, while :data:`REFERENCE_PROBLEM` reproduces the
reference's manufactured solution exactly for parity testing.

All evaluation is pure jnp on device; fields are materialized once per level and
stay device-resident for the whole cycle (unlike the reference's per-op host
round-trips, MG_solver_GPU.cu:1184-1278).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ..grid import GridSpec

Field2D = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x, y) -> value


def _zero_field(x, y):
    return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class Problem:
    """A 2D Poisson problem ``∇²u = f`` on a square with Dirichlet boundary.

    Attributes:
        source: f(x, y) evaluated at interior points.
        boundary: u(x, y) evaluated on the boundary (Dirichlet data).
        analytic: optional exact solution for validation.
        name: identifier used in logs/reports.
    """

    source: Field2D
    boundary: Field2D = _zero_field
    analytic: Optional[Field2D] = None
    name: str = "custom"

    def source_grid(self, spec: GridSpec, dtype=jnp.float32) -> jnp.ndarray:
        """RHS array with boundary entries zeroed.

        Matches getSource (MG_solver_CPU.cpp:468-491): interior = f(x, y),
        boundary rows/cols = 0 (the boundary equations are handled separately).
        """
        x, y = spec.coords(dtype)
        f = self.source(x, y).astype(dtype)
        return _zero_border(f)

    def boundary_grid(self, spec: GridSpec, dtype=jnp.float32) -> jnp.ndarray:
        """Array that is the Dirichlet data on the border and 0 inside."""
        x, y = spec.coords(dtype)
        g = self.boundary(x, y).astype(dtype)
        interior_zero = jnp.zeros(spec.shape, dtype)
        return interior_zero.at[0, :].set(g[0, :]).at[-1, :].set(g[-1, :]) \
            .at[:, 0].set(g[:, 0]).at[:, -1].set(g[:, -1])

    def analytic_grid(self, spec: GridSpec, dtype=jnp.float32) -> jnp.ndarray:
        """Exact solution evaluated on the grid (interior; boundary from `boundary`).

        Matches getAnalytic (MG_solver_CPU.cpp:525-548): interior = analytic,
        border = boundary data.
        """
        if self.analytic is None:
            raise ValueError(f"problem {self.name!r} has no analytic solution")
        x, y = spec.coords(dtype)
        u = self.analytic(x, y).astype(dtype)
        b = self.boundary_grid(spec, dtype)
        u = _zero_border(u) + b
        return u


def _zero_border(a: jnp.ndarray) -> jnp.ndarray:
    return a.at[0, :].set(0).at[-1, :].set(0).at[:, 0].set(0).at[:, -1].set(0)


# --- The reference's manufactured problem -----------------------------------
# source   f = 2 x (y - 1) (y - 2x + xy + 2) e^(x - y)   (MG_solver_CPU.cpp:488)
# boundary u = 0                                          (MG_solver_CPU.cpp:497-523)
# analytic u = e^(x - y) x (1 - x) y (1 - y)              (MG_solver_CPU.cpp:543)

def _ref_source(x, y):
    return 2.0 * x * (y - 1.0) * (y - 2.0 * x + x * y + 2.0) * jnp.exp(x - y)


def _ref_analytic(x, y):
    return jnp.exp(x - y) * x * (1.0 - x) * y * (1.0 - y)


REFERENCE_PROBLEM = Problem(
    source=_ref_source,
    boundary=_zero_field,
    analytic=_ref_analytic,
    name="reference-manufactured",
)


# --- Additional built-in problem families ------------------------------------

def sine_problem(kx: int = 1, ky: int = 1) -> Problem:
    """u = sin(kx·πx)·sin(ky·πy): smooth eigenfunction problem, zero boundary."""
    import math

    cx, cy = kx * math.pi, ky * math.pi

    def source(x, y):
        return -(cx * cx + cy * cy) * jnp.sin(cx * x) * jnp.sin(cy * y)

    def analytic(x, y):
        return jnp.sin(cx * x) * jnp.sin(cy * y)

    return Problem(source=source, analytic=analytic, name=f"sine-{kx}-{ky}")


def polynomial_problem() -> Problem:
    """u = x(1-x)y(1-y): lowest-order polynomial with zero boundary."""

    def source(x, y):
        return -2.0 * (y * (1.0 - y) + x * (1.0 - x))

    def analytic(x, y):
        return x * (1.0 - x) * y * (1.0 - y)

    return Problem(source=source, analytic=analytic, name="polynomial")


def gaussian_charge_problem(x0: float = 0.5, y0: float = 0.5, sigma: float = 0.05) -> Problem:
    """Point-like Gaussian charge; no closed-form solution (validation via residual)."""

    def source(x, y):
        r2 = (x - x0) ** 2 + (y - y0) ** 2
        return jnp.exp(-r2 / (2.0 * sigma * sigma))

    return Problem(source=source, name="gaussian-charge")


BUILTIN_PROBLEMS = {
    "reference": REFERENCE_PROBLEM,
    "sine": sine_problem(),
    "polynomial": polynomial_problem(),
    "gaussian": gaussian_charge_problem(),
}
