"""3-D deep convergence: multi-word fp32 iterative refinement on cubic grids.

The 2-D refinement subsystem (refine.py) reaches 1e-10-class relative
residuals at production sizes with zero fp64 arrays: the state is a
double-float ("df32", ~2⁻⁴⁸) or triple-word ("tw32", ~2⁻⁷²) fp32 expansion,
the residual is evaluated with error-free-transform (two-sum) chains, and
each outer cycle applies ONE fp32 multigrid V-cycle on the correction
equation. This module is the same structure one dimension up:

    r  = f − A₇·(u₀ + u₁ [+ u₂])   — compensated 7-point stencil sum
    e  ≈ A₇⁻¹ r                    — one v_cycle3 (fused Pallas bricks on TPU)
    u += e                          — two-sum accumulation into the words

The 7-point EFT chain has 6 neighbor adds + the −6u diagonal (vs 4 + −4u in
2-D); everything else (word renormalization, the Sterbenz-exact big-term
combination, the interior masking) carries over unchanged. The whole loop —
cycles, compensated norms, convergence test — is one ``lax.while_loop`` on
device (the remote tunnel costs ~0.6 s per host sync, SKILL.md).

Floor: eps_state·‖A‖‖u‖/‖f‖ with ‖A‖ ∝ 12/h² — same N² scaling law as the
2-D floor (measured there as 3.9e-24·(N−1)^1.99 for tw32); at 513³ the tw32
floor is ~1e-17, far below any practical tolerance.

No reference counterpart (the reference is strictly 2-D, fp64-host state —
SURVEY.md §2 C15); this is the capability extension that makes the 3-D
stack production-deep, not just demonstration-deep.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .models.poisson3d import Problem3D, v_cycle3, v_cycle3_p
from .ops.precision import two_sum
from .refine import df_add, tw_add


def _interior_mask3(n: int, shape=None):
    """Interior mask for a cubic (n, n, n) or padded (n, rp, cp) volume —
    the padded rows/lanes (≥ n) are excluded like the Dirichlet faces."""
    nz, rp, cp = (n, n, n) if shape is None else shape
    z = jnp.arange(nz).reshape(nz, 1, 1)
    r = jnp.arange(rp).reshape(1, rp, 1)
    c = jnp.arange(cp).reshape(1, 1, cp)
    return ((z >= 1) & (z <= n - 2) & (r >= 1) & (r <= n - 2)
            & (c >= 1) & (c <= n - 2))


def _rolled_neighbors3(u):
    return (jnp.roll(u, 1, 0), jnp.roll(u, -1, 0),
            jnp.roll(u, 1, 1), jnp.roll(u, -1, 1),
            jnp.roll(u, 1, 2), jnp.roll(u, -1, 2))


def residual_df3(u_hi, u_lo, f, h: float):
    """Compensated residual of the 3-D double-float pair state.

    r = (Σ₆nb(u_hi+u_lo) − 6(u_hi+u_lo))/h² − f with the u_hi stencil sum in
    error-free two-sums (the cancellation-critical part) and the u_lo sum in
    plain fp32 (already at the eps·|u| level). Interior only, like the 2-D
    residual_df_p."""
    nbs = _rolled_neighbors3(u_hi)
    hi, lo = two_sum(nbs[0], nbs[1])
    for t in nbs[2:]:
        hi, e = two_sum(hi, t)
        lo = lo + e
    for _ in range(6):
        hi, e = two_sum(hi, -u_hi)
        lo = lo + e
    nbl = _rolled_neighbors3(u_lo)
    slo = nbl[0] + nbl[1] + nbl[2] + nbl[3] + nbl[4] + nbl[5] - 6.0 * u_lo
    inv_h2 = jnp.asarray(1.0 / (h * h), u_hi.dtype)
    r = (hi * inv_h2 - f) + (lo + slo) * inv_h2
    return jnp.where(_interior_mask3(u_hi.shape[0], u_hi.shape), r,
                     jnp.zeros_like(r))


def _eft_stencil_sum_dd3(u):
    """(hi, lo, lo2) with hi + lo + lo2 ≈ Σ₆ neighbors − 6u to ~eps³: the
    doubly-compensated chain of refine._eft_stencil_sum_dd with the 7-point
    term list."""
    nbs = _rolled_neighbors3(u)
    hi, lo = two_sum(nbs[0], nbs[1])
    lo2 = jnp.zeros_like(hi)
    for term in (nbs[2], nbs[3], nbs[4], nbs[5], -u, -u, -u, -u, -u, -u):
        hi, e = two_sum(hi, term)
        lo, e2 = two_sum(lo, e)
        lo2 = lo2 + e2
    hi, e = two_sum(hi, lo)
    lo, e2 = two_sum(e, lo2)
    return hi, lo, e2


def residual_tw3(u0, u1, u2, f, h: float):
    """Compensated residual of the 3-D triple-word state (the 2-D
    residual_tw_p layout: doubly-compensated u0/u1 chains, plain u2 sum,
    Sterbenz-exact big-term combination, compensated small-term fold)."""
    hi0, lo0, m0 = _eft_stencil_sum_dd3(u0)
    hi1, lo1, m1 = _eft_stencil_sum_dd3(u1)
    nb2 = _rolled_neighbors3(u2)
    s2 = nb2[0] + nb2[1] + nb2[2] + nb2[3] + nb2[4] + nb2[5] - 6.0 * u2
    inv_h2 = jnp.asarray(1.0 / (h * h), u0.dtype)
    r_big = hi0 * inv_h2 - f
    t, c = two_sum(lo0, hi1)
    t2 = ((lo1 + m0) + (m1 + s2)) + c
    r = (r_big + t * inv_h2) + t2 * inv_h2
    return jnp.where(_interior_mask3(u0.shape[0], u0.shape), r,
                     jnp.zeros_like(r))


@dataclasses.dataclass
class Refine3Report:
    u: jnp.ndarray                  # best fp32 representation, (n, n, n)
    u_lo: jnp.ndarray               # second word
    rel_residual: float             # compensated ‖r‖₂/‖f‖₂ at exit
    cycles: int
    wall_time_s: float
    error_vs_analytic: Optional[float] = None


class IterativeRefinement3:
    """Solve the 3-D Poisson problem to a relative-residual target.

    ``state`` ∈ {"df32", "tw32"} picks the outer precision (both keep the
    inner V-cycles on the fp32 fused-brick fast path; an emulated-f64 state
    adds nothing over df32 on TPU — see the 2-D floor measurements)."""

    def __init__(self, problem: Problem3D, n: int, max_cycles: int = 60,
                 state: str = "df32", pre: int = 3, post: int = 3,
                 omega: float = 6.0 / 7.0, kernels: Optional[str] = None,
                 dtype=jnp.float32):
        from .ops.pallas3d import (padded_shape3, residual_df3_pallas,
                                   residual_tw3_pallas)

        if state not in ("df32", "tw32"):
            raise ValueError(f"unknown state {state!r} (df32 or tw32)")
        self.problem, self.n, self.state = problem, n, state
        self.max_cycles = max_cycles
        self.dtype = dtype
        self.h = 1.0 / (n - 1)
        if kernels is None:
            kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
        h = self.h
        # the outer state lives in the padded (nz, rp, cp) brick layout for
        # the whole solve: the pallas path then never pads/unpads, and the
        # Pallas mw-residual kernels replace the XLA roll forms, whose ~10
        # full-volume roll temporaries both cost ~2x the inner-cycle time at
        # 257³ and OOM the chip at 513³ (measured 2026-08-18)
        self._shape = padded_shape3(n)
        use_pk = kernels == "pallas"
        interp = jax.default_backend() != "tpu"

        def res_df(u0, u1, f):
            if use_pk:
                return residual_df3_pallas(u0, u1, f, n, h, interpret=interp)
            return residual_df3(u0, u1, f, h)

        def res_tw(u0, u1, u2, f):
            if use_pk:
                return residual_tw3_pallas(u0, u1, u2, f, n, h,
                                           interpret=interp)
            return residual_tw3(u0, u1, u2, f, h)

        def cycle(rhs):
            # correction equation A·e = rhs, zero Dirichlet everywhere
            if use_pk:
                return v_cycle3_p(jnp.zeros_like(rhs), rhs, n, h, pre=pre,
                                  post=post, omega=omega)
            from .ops.pallas3d import pad_grid3, unpad_grid3
            e = v_cycle3(jnp.zeros((n,) * 3, rhs.dtype),
                         unpad_grid3(rhs, n), h, pre=pre, post=post,
                         omega=omega, kernels="xla")
            return pad_grid3(e)

        def fnorm(f):
            # mask built INSIDE the trace (iota comparisons): a concrete
            # bool volume closed over here would serialize as a jaxpr
            # constant into the remote-compile request (CLAUDE.md trap)
            mask = _interior_mask3(n, self._shape)
            return jnp.linalg.norm(jnp.ravel(jnp.where(mask, f, 0.0)))

        def make_den(f, r0):
            # ‖f‖ normalization; initial residual as the harmonic fallback
            # (same rule as refine.make_den)
            nf = fnorm(f).astype(r0.dtype)
            return jnp.where(nf > 1e-20, nf,
                             jnp.maximum(r0, jnp.asarray(1e-30, r0.dtype)))

        def run_df(u0, u1, f, tol, budget):
            i0, i1 = self.initial_state()
            den = make_den(f, jnp.linalg.norm(jnp.ravel(
                res_df(i0, i1, f))))
            r = res_df(u0, u1, f)

            def step(state_):
                u0, u1, r, _, k = state_
                e = cycle(-r)
                u0, u1 = df_add(u0, u1, e)
                r = res_df(u0, u1, f)
                rel = jnp.linalg.norm(jnp.ravel(r)) / den
                return u0, u1, r, rel, k + 1

            def cond(state_):
                return jnp.logical_and(state_[3] > tol, state_[4] < budget)

            rel0 = (jnp.linalg.norm(jnp.ravel(r)) / den).astype(self.dtype)
            init = (u0, u1, r, rel0, jnp.asarray(0, jnp.int32))
            u0, u1, _, rel, k = lax.while_loop(cond, step, init)
            return u0, u1, rel, k

        def run_tw(u0, u1, u2, f, tol, budget):
            i0, i1 = self.initial_state()
            den = make_den(f, jnp.linalg.norm(jnp.ravel(
                res_tw(i0, i1, jnp.zeros_like(i0), f))))
            r = res_tw(u0, u1, u2, f)

            def step(state_):
                u0, u1, u2, r, _, k = state_
                e = cycle(-r)
                u0, u1, u2 = tw_add(u0, u1, u2, e)
                r = res_tw(u0, u1, u2, f)
                rel = jnp.linalg.norm(jnp.ravel(r)) / den
                return u0, u1, u2, r, rel, k + 1

            def cond(state_):
                return jnp.logical_and(state_[4] > tol, state_[5] < budget)

            rel0 = (jnp.linalg.norm(jnp.ravel(r)) / den).astype(self.dtype)
            init = (u0, u1, u2, r, rel0, jnp.asarray(0, jnp.int32))
            u0, u1, u2, _, rel, k = lax.while_loop(cond, step, init)
            return u0, u1, u2, rel, k

        self._run = jax.jit(run_tw if state == "tw32" else run_df)

    def initial_state(self):
        """Padded-layout (u0, u1): Dirichlet faces + zero interior."""
        from .ops.pallas3d import pad_grid3
        u0 = pad_grid3(self.problem.boundary_grid(self.n, self.dtype))
        return u0, jnp.zeros_like(u0)

    def init_rhs(self) -> jnp.ndarray:
        from .ops.pallas3d import pad_grid3
        return pad_grid3(self.problem.source_grid(self.n, self.dtype)
                         + self.problem.boundary_grid(self.n, self.dtype))

    def _fingerprint(self) -> str:
        return (f"refine3/{self.problem.name}/n={self.n}/{self.state}/"
                f"{jnp.dtype(self.dtype).name}")

    def solve(self, tol: float = 1e-8, checkpoints=None,
              checkpoint_chunk: int = 10) -> Refine3Report:
        """Refine to ``tol``. With a ``CheckpointManager`` in ``checkpoints``
        the loop runs in device-side chunks of ``checkpoint_chunk`` cycles,
        persisting (and resuming) the full multi-word state between chunks —
        the same contract as the 2-D IterativeRefinementSolver.solve."""
        f = self.init_rhs()
        u0, u1 = self.initial_state()
        start = time.perf_counter()
        if checkpoints is not None:
            u0, u1, rel, k = self._solve_checkpointed(f, tol, checkpoints,
                                                      checkpoint_chunk)
        elif self.state == "tw32":
            u0, u1, _, rel, k = self._run(u0, u1, jnp.zeros_like(u0), f,
                                          tol, self.max_cycles)
        else:
            u0, u1, rel, k = self._run(u0, u1, f, tol, self.max_cycles)
        rel_f = float(jax.device_get(rel))
        wall = time.perf_counter() - start
        from .ops.pallas3d import unpad_grid3
        u0, u1 = unpad_grid3(u0, self.n), unpad_grid3(u1, self.n)
        err = None
        if self.problem.analytic is not None:
            ua = self.problem.analytic_grid(self.n, self.dtype)
            err = float(jax.device_get(jnp.mean(jnp.abs(u0 - ua))))
        return Refine3Report(u=u0, u_lo=u1, rel_residual=rel_f,
                             cycles=int(jax.device_get(k)),
                             wall_time_s=wall, error_vs_analytic=err)


    def _solve_checkpointed(self, f, tol, manager, chunk: int):
        """Host-side chunked loop with persistence (utils.checkpoint): both
        the df32 (two-word) and tw32 (three-word) states resume losslessly
        (the npz format keeps all words at full width)."""
        from .utils.checkpoint import SolverState

        is_tw = self.state == "tw32"
        fp = self._fingerprint()
        done = 0
        resumed = manager.latest()
        if (resumed is not None and resumed.meta
                and resumed.meta.get("schedule") == fp
                and resumed.u.shape == self._shape):
            u0 = jnp.asarray(resumed.u)
            u1 = (jnp.asarray(resumed.u_lo) if resumed.u_lo is not None
                  else jnp.zeros_like(u0))
            u2 = (jnp.asarray(resumed.u_lo2) if resumed.u_lo2 is not None
                  else jnp.zeros_like(u0))
            done = resumed.cycle
        else:
            u0, u1 = self.initial_state()
            u2 = jnp.zeros_like(u0)

        rel = None
        while done < self.max_cycles:
            budget = min(chunk, self.max_cycles - done)
            if is_tw:
                u0, u1, u2, rel, k = self._run(u0, u1, u2, f, tol, budget)
                state = SolverState(u=u0, f=f, u_lo=u1, u_lo2=u2, cycle=0,
                                    meta={"schedule": fp, "tol": tol})
            else:
                u0, u1, rel, k = self._run(u0, u1, f, tol, budget)
                state = SolverState(u=u0, f=f, u_lo=u1, cycle=0,
                                    meta={"schedule": fp, "tol": tol})
            done += int(jax.device_get(k))
            state.cycle = done
            manager.maybe_save(state)
            if float(jax.device_get(rel)) <= tol:
                break
        if rel is None:
            # resumed checkpoint already at the cycle budget: a zero-budget
            # run reports the TRUE residual of the restored state
            if is_tw:
                *_, rel, _ = self._run(u0, u1, u2, f, tol, 0)
            else:
                *_, rel, _ = self._run(u0, u1, f, tol, 0)
        return u0, u1, rel, jnp.asarray(done, jnp.int32)


def solve_to_tolerance3(problem: Problem3D, n: int, tol: float = 1e-8,
                        max_cycles: int = 60, state: str = "df32",
                        **kw) -> Refine3Report:
    """One-call driver: 3-D iterative refinement until ‖r‖/‖f‖ ≤ tol."""
    return IterativeRefinement3(problem, n, max_cycles, state, **kw).solve(tol)
