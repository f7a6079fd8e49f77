"""Whole-cycle compilation: a CycleProgram becomes ONE jitted XLA program.

This is the TPU-native replacement for the reference's interpreter loop
(``while(!f_read.eof())`` dispatching one numerical call at a time,
MG_solver_CPU.cpp:158-426) and for its per-op host↔device churn
(MG_solver_GPU.cu:1184-1278). A cycle schedule is *static data*: every level
shape, sweep count, and restriction target is known before the first flop.
So instead of interpreting it node by node, we trace the entire schedule —
every smoothing sweep, restriction, coarse solve, and prolongation across all
levels — into a single XLA computation:

  * zero host round-trips inside a cycle (the reference GPU does several per
    *op*; its GS coarse solver syncs the host every iteration,
    MG_solver_GPU.cu:1507-1522);
  * XLA fuses across op boundaries (residual+negate+restrict, prolong+add+
    smooth) and schedules the whole cycle as one program;
  * data-dependent pieces (error-trigger sweeps, coarse GS convergence) stay
    on device as ``lax.while_loop``s with scalar predicates;
  * multi-chip: per-level ``with_sharding_constraint`` annotations let GSPMD
    partition every stencil over the row axis of a device mesh and insert the
    halo collective-permutes / reduction psums itself — levels below the
    sharding threshold are replicated (coarse-level agglomeration).

The interpreted engine (solver.MultigridSolver) remains the instrumented /
parity-reporting path; this module is the performance path. Both execute the
same CycleProgram semantics (including warm-restart, linkedlist.h:38-41).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .grid import GridSpec
from .models.problems import Problem
from .ops import coarse as coarse_ops
from .ops import stencils
from .ops.zoom import zoom
from .parallel.mesh import ShardingPolicy
from .schedule import Ascend, CoarseSolve, CycleProgram, Descend
from .solver import SolverConfig


@dataclasses.dataclass
class _TraceLevel:
    spec: GridSpec
    u: Any
    f: Any
    is_fmg: bool = False


class CompiledCycle:
    """A CycleProgram compiled end-to-end into one XLA executable.

    Call with ``(u0, f0)`` on the finest grid; returns ``(u, err)`` where
    ``err`` is the last smoothing error observed at the finest level (a device
    scalar usable as a convergence measure without extra passes). Invoking it
    repeatedly iterates cycles with warm-restart semantics, since the finest
    ``u`` flows through unreset on the first Descend (matching the
    reference's init-flag behavior for chained cycles when the caller feeds
    each cycle's output into the next).
    """

    def __init__(self, program: CycleProgram, problem: Problem,
                 config: SolverConfig = SolverConfig(),
                 policy: Optional[ShardingPolicy] = None,
                 warm: bool = False, donate: bool = True):
        program.validate()
        self.program = program
        self.problem = problem
        self.config = config
        self.policy = policy
        self.warm = warm
        self.finest_spec = GridSpec(program.n_max, program.length,
                                    program.min_x, program.min_y)
        fn = partial(_run_traced, program=program, problem=problem,
                     config=config, policy=policy, warm=warm)
        self.fn = jax.jit(fn, donate_argnums=(0,) if donate else ())

    # -- data construction ----------------------------------------------------

    def init(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Device-resident (u0, f0) for the finest level, placed per policy."""
        cfg, spec = self.config, self.finest_spec

        def build():
            f = (self.problem.source_grid(spec, cfg.dtype)
                 + self.problem.boundary_grid(spec, cfg.dtype))
            u = self.problem.boundary_grid(spec, cfg.dtype)
            return u, f

        if self.policy is None:
            return jax.jit(build)()
        # Odd grid sizes (2^k + 1) don't divide power-of-two meshes, and jit
        # boundaries reject uneven explicit shardings — but *internal*
        # with_sharding_constraint annotations accept them (GSPMD pads the
        # last shard). So init under the constraint inside one jit: the
        # returned arrays are already laid out row-sharded.
        sh = self.policy.sharding(spec.n)

        def build_sharded():
            u, f = build()
            return (lax.with_sharding_constraint(u, sh),
                    lax.with_sharding_constraint(f, sh))

        return jax.jit(build_sharded)()

    def __call__(self, u, f):
        return self.fn(u, f)

    def lower_text(self) -> str:
        """StableHLO of the whole cycle (for inspection/tests)."""
        u, f = self.init()
        return str(self.fn.lower(u, f).as_text())


def _constrain(x, policy: Optional[ShardingPolicy], n: int):
    if policy is None:
        return x
    return lax.with_sharding_constraint(x, policy.sharding(n))


def _trigger_smooth_traced(u, f, h, cfg: SolverConfig):
    """Device-side error-trigger loop (MG_solver_CPU.cpp:194-240): smooth one
    sweep at a time while |err_k − err_{k−1}| > trigger."""
    sweep = {"jacobi": partial(stencils.jacobi_sweep, omega=cfg.omega),
             "rbgs": stencils.redblack_gs_sweep}[cfg.smoother]
    u = sweep(u, f, h)
    err0 = stencils.smoothing_error(u, f, h, compat=cfg.compat_error)

    def cond(state):
        _, _, slope, k = state
        return jnp.logical_and(slope > cfg.trigger, k < cfg.max_trigger_sweeps)

    def body(state):
        u, prev, _, k = state
        u = sweep(u, f, h)
        err = stencils.smoothing_error(u, f, h, compat=cfg.compat_error)
        return u, err, jnp.abs(err - prev), k + 1

    init = (u, err0, jnp.asarray(cfg.trigger + 1.0, err0.dtype),
            jnp.asarray(1, jnp.int32))
    u, err, _, _ = lax.while_loop(cond, body, init)
    return u, err


def _smooth_traced(u, f, h, steps: int, cfg: SolverConfig):
    if steps == -1:
        return _trigger_smooth_traced(u, f, h, cfg)
    sweep = {"jacobi": partial(stencils.jacobi_sweep, omega=cfg.omega),
             "rbgs": stencils.redblack_gs_sweep}[cfg.smoother]
    u = lax.fori_loop(0, steps, lambda _, v: sweep(v, f, h), u, unroll=True)
    err = stencils.smoothing_error(u, f, h, compat=cfg.compat_error)
    return u, err


def _run_traced(u0, f0, *, program: CycleProgram, problem: Problem,
                config: SolverConfig, policy: Optional[ShardingPolicy],
                warm: bool):
    """Trace the full instruction sequence; returns (u_finest, last_err)."""
    cfg = config
    finest_spec = GridSpec(program.n_max, program.length,
                           program.min_x, program.min_y)
    levels = [_TraceLevel(finest_spec, u0, f0)]
    warm_now = warm
    last_err = jnp.asarray(0.0, cfg.dtype)

    for ins in program.instructions:
        lvl = levels[-1]
        n, h = lvl.spec.n, lvl.spec.h

        if isinstance(ins, Descend):
            finest = len(levels) == 1
            if not (finest and warm_now) and not lvl.is_fmg:
                # reference memset semantics (MG_solver_CPU.cpp:209-214)
                if finest:
                    lvl.u = _constrain(
                        problem.boundary_grid(lvl.spec, cfg.dtype), policy, n)
                else:
                    lvl.u = jnp.zeros(lvl.spec.shape, cfg.dtype)
                    lvl.u = _constrain(lvl.u, policy, n)

            next_spec = lvl.spec.coarsened(ins.next_n)
            if ins.steps == 0:
                # FMG descent: restrict the full RHS, no smoothing
                # (the reference's TODO branch, MG_solver_CPU.cpp:296-299).
                f_c = zoom(lvl.f, ins.next_n, zero_boundary=True)
                f_c = f_c + problem.boundary_grid(next_spec, cfg.dtype)
                f_c = _constrain(f_c, policy, ins.next_n)
                levels.append(_TraceLevel(
                    next_spec, _constrain(jnp.zeros(next_spec.shape, cfg.dtype),
                                          policy, ins.next_n),
                    f_c, is_fmg=True))
                continue

            lvl.u, err = _smooth_traced(lvl.u, lvl.f, h, ins.steps, cfg)
            lvl.u = _constrain(lvl.u, policy, n)
            if finest:
                last_err = err
            d = stencils.residual(lvl.u, lvl.f, h)
            f_c = _constrain(zoom(-d, ins.next_n, zero_boundary=True),
                             policy, ins.next_n)
            levels.append(_TraceLevel(
                next_spec,
                _constrain(jnp.zeros(next_spec.shape, cfg.dtype), policy, ins.next_n),
                f_c))

        elif isinstance(ins, CoarseSolve):
            if ins.option == 0:
                lvl.u = coarse_ops.dense_solve(lvl.f, h)
            else:
                dt = jnp.float32 if ins.option == 2 else cfg.dtype
                u, _, _ = coarse_ops.gauss_seidel_solve(
                    lvl.f.astype(dt), h, ins.target_error,
                    norm=cfg.coarse_gs_norm)
                lvl.u = u.astype(cfg.dtype)
            lvl.u = _constrain(lvl.u, policy, n)

        elif isinstance(ins, Ascend):
            child = levels.pop()
            lvl = levels[-1]
            n, h = lvl.spec.n, lvl.spec.h
            corr = zoom(child.u, n)
            lvl.u = lvl.u.at[1:-1, 1:-1].add(corr[1:-1, 1:-1])
            lvl.u = _constrain(lvl.u, policy, n)
            if len(levels) == 1:
                warm_now = True
            if ins.steps != 0:
                lvl.u, err = _smooth_traced(lvl.u, lvl.f, h, ins.steps, cfg)
                lvl.u = _constrain(lvl.u, policy, n)
                if len(levels) == 1:
                    last_err = err
        else:  # pragma: no cover
            raise TypeError(f"unknown instruction {ins!r}")

    return levels[0].u, last_err


def compile_program(program: CycleProgram, problem: Problem,
                    config: SolverConfig = SolverConfig(),
                    policy: Optional[ShardingPolicy] = None,
                    warm: bool = False, donate: bool = True) -> CompiledCycle:
    """Compile ``program`` for ``problem`` into a single jitted callable."""
    return CompiledCycle(program, problem, config, policy, warm, donate)
