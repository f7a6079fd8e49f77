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
  * level arrays live in the padded TPU-tile layout (ops.layout) for the
    whole cycle, so the Pallas strip smoother (ops.pallas_kernels) and the
    MXU zoom matmuls run on aligned shapes with no repacking;
  * data-dependent pieces (error-trigger sweeps, coarse GS convergence) stay
    on device as ``lax.while_loop``s with scalar predicates;
  * multi-chip: per-level ``with_sharding_constraint`` annotations let GSPMD
    partition every stencil over the row axis of a device mesh and insert
    halo collective-permutes / reduction psums itself — levels below the
    sharding threshold are replicated (coarse-level agglomeration).

The interpreted engine (solver.MultigridSolver) remains the instrumented /
parity-reporting path; this module is the performance path. Both execute the
same CycleProgram semantics (including warm-restart, linkedlist.h:38-41).
"""

from __future__ import annotations

import dataclasses
import sys
from functools import partial
from typing import Any, Optional

def _ensure_trace_recursion_limit():
    """Tracing a whole deep-hierarchy schedule (11 levels at N=8193, every
    sweep unrolled) nests Python frames beyond the default 1000 limit, and
    JAX's jaxpr traversals recurse proportionally to the op chain. Raised
    lazily when an engine is built (not at import) so merely importing the
    package doesn't change process-wide limits."""
    if sys.getrecursionlimit() < 50_000:
        sys.setrecursionlimit(50_000)

import jax
import jax.numpy as jnp
from jax import lax

from .grid import GridSpec
from .models.problems import Problem
from .ops import coarse as coarse_ops
from .ops import padded as P
from .ops.layout import pad_grid, pad_grid_to, padded_shape, unpad_grid
from .parallel.mesh import ShardingPolicy
from .schedule import Ascend, CoarseSolve, CycleProgram, Descend
from .solver import SolverConfig


def _use_pallas(config: SolverConfig) -> bool:
    mode = getattr(config, "kernels", "auto")
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return mode == "pallas"


def _pallas_interpret() -> bool:
    """Explicit kernels='pallas' off-TPU (tests, the driver dryrun) runs the
    kernels in Pallas interpret mode; on TPU they compile through Mosaic."""
    return jax.default_backend() != "tpu"


def _pshape(n: int, policy: Optional[ShardingPolicy]) -> tuple[int, int]:
    """Padded tile shape for level n: policy-aware so sharded levels keep
    per-device (8, 128) tile alignment (parallel.mesh.padded_shape)."""
    return padded_shape(n) if policy is None else policy.padded_shape(n)


@dataclasses.dataclass
class _TraceLevel:
    spec: GridSpec
    u: Any
    f: Any
    is_fmg: bool = False


class CompiledCycle:
    """A CycleProgram compiled end-to-end into one XLA executable.

    Arrays flow in the padded tile layout: ``init()`` produces padded
    ``(u0, f0)``; calling the object returns ``(u, err)`` with ``u`` padded;
    ``unpad(u)`` recovers the true (n, n) grid.

    Warm restart (the reference's init-flag behavior, linkedlist.h:38-41):
    with the default ``warm=False`` every call RESETS the finest iterate, so
    chaining the output into the same instance repeats cycle 1. To iterate
    cycles, either build a second instance with ``warm=True`` and chain
    through that, or use :meth:`iterate`, which does both.
    """

    def __init__(self, program: CycleProgram, problem: Problem,
                 config: SolverConfig = SolverConfig(),
                 policy: Optional[ShardingPolicy] = None,
                 warm: bool = False, donate: bool = True):
        _ensure_trace_recursion_limit()
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
        """Padded, device-resident (u0, f0) for the finest level."""
        cfg, spec = self.config, self.finest_spec

        def build():
            shape = _pshape(spec.n, self.policy)
            f = pad_grid_to(self.problem.source_grid(spec, cfg.dtype)
                            + self.problem.boundary_grid(spec, cfg.dtype),
                            shape)
            u = pad_grid_to(self.problem.boundary_grid(spec, cfg.dtype),
                            shape)
            if self.policy is not None:
                sh = self.policy.sharding(spec.n)
                u = lax.with_sharding_constraint(u, sh)
                f = lax.with_sharding_constraint(f, sh)
            return u, f

        return jax.jit(build)()

    def __call__(self, u, f):
        return self.fn(u, f)

    def iterate(self, cycles: int):
        """Run ``cycles`` warm-restarted cycles as one jitted computation.

        Returns a jitted ``fn(u0, f) -> u`` that executes one cold cycle
        followed by ``cycles − 1`` warm ones (the chained-cycle semantics of
        the reference's init flag).
        """
        warm = CompiledCycle(self.program, self.problem, self.config,
                             self.policy, warm=True, donate=False)

        def chained(u, f):
            u = self.fn(u, f)[0]
            return jax.lax.fori_loop(
                0, cycles - 1, lambda i, v: warm.fn(v, f)[0], u)

        return jax.jit(chained)

    def unpad(self, u: jnp.ndarray) -> jnp.ndarray:
        return unpad_grid(u, self.finest_spec.n)

    def lower_text(self) -> str:
        """StableHLO of the whole cycle (for inspection/tests)."""
        u, f = self.init()
        return str(self.fn.lower(u, f).as_text())


def _constrain(x, policy: Optional[ShardingPolicy], n: int):
    if policy is None:
        return x
    return lax.with_sharding_constraint(x, policy.sharding(n))


def _zoom(cfg: SolverConfig):
    return P.zoom_take_p if cfg.zoom == "take" else P.zoom_p


def _leg_sharded_ok(policy, n: int) -> bool:
    """policy shards level n with a leading row axis — the layouts
    (1-D rows, 2-D row×col blocks) the sharded fused descend/ascend
    wrappers support (parallel.pallas_shard)."""
    if policy is None or not policy.is_sharded(n):
        return False
    return policy.spec(n)[0] is not None


def _fuse_descend_ok(cfg: SolverConfig, policy, n: int, m: int,
                     steps: int) -> bool:
    """Whether the one-kernel fused descend leg applies: Pallas, Jacobi
    smoothing, a 2:1 vertex-aligned coarse level, a sweep count within the
    kernel's trapezoid budget — single-chip, or sharded under a rows or 2-D
    block policy (parallel.pallas_shard.sharded_fused_descend)."""
    if not (_use_pallas(cfg) and cfg.smoother == "jacobi"
            and n == 2 * m - 1):
        return False
    if policy is not None and not _leg_sharded_ok(policy, n):
        return False
    cap = 6 if cfg.restriction == "full_weighting" else 7
    return 1 <= steps <= cap


def _fuse_ascend_ok(cfg: SolverConfig, policy, n: int, n_child: int,
                    steps: int, finest: bool) -> bool:
    """Whether the one-kernel fused ascend leg applies (see _fuse_descend_ok;
    the error budget only binds when this level reports the metric)."""
    if not (_use_pallas(cfg) and cfg.smoother == "jacobi"
            and n == 2 * n_child - 1):
        return False
    if policy is not None:
        if not _leg_sharded_ok(policy, n):
            return False
        # the shard wrapper exchanges 16-row fine / 16-row coarse halos:
        # needs ≥ 32 fine rows per device (coarse blocks ≥ 16)
        ndev = policy.mesh.shape[policy.spec(n)[0]]
        if policy.padded_shape(n)[0] // ndev < 32:
            return False
    cap = 8 if (not finest or cfg.compat_error == "gpu") else 7
    return 1 <= steps <= cap


def _residual(u, f, h, n: int, cfg: SolverConfig, policy):
    """5-point residual: the Pallas strip kernel on the hot path (XLA's
    roll-based form materializes 4 shifted copies — measured 3.5× slower).
    Sharded levels run the same kernel per shard under shard_map with an
    explicit ppermute halo exchange (parallel.pallas_shard); replicated
    levels and non-Pallas configs use the XLA form."""
    if _use_pallas(cfg):
        if policy is None:
            from .ops.pallas_kernels import residual_pallas
            return residual_pallas(u, f, n, h, interpret=_pallas_interpret())
        if policy.is_sharded(n):
            from .parallel.pallas_shard import sharded_residual_pallas
            return sharded_residual_pallas(u, f, n, h, policy,
                                           interpret=_pallas_interpret())
    return P.residual_p(u, f, h, n)


def _restrict(d, n: int, m: int, cfg: SolverConfig, policy=None):
    """Coarse RHS from the negated fine residual, per the restriction policy."""
    if cfg.restriction == "full_weighting":
        if n != 2 * m - 1:
            # never fall back silently: the user asked for FW because of the
            # rb-GS sampling pathology; degrading to sampling would diverge
            raise ValueError(
                f"restriction='full_weighting' requires 2:1 vertex-aligned "
                f"levels (n == 2m-1), got {n} -> {m}; build the schedule "
                f"with coarsen=3 (odd-halve) or use restriction='sampling'")
        return P.full_weighting_restrict_p(-d, n, m, _pshape(m, policy))
    return _zoom(cfg)(-d, n, m, _pshape(m, policy), zero_boundary=True)


def _sweeps(u, f, h, n: int, steps: int, cfg: SolverConfig, policy=None,
            from_zero: bool = False):
    """``steps`` smoothing sweeps on padded arrays, Pallas-fused when enabled.

    Sharded levels run the fused kernel PER SHARD under shard_map, with one
    8-row/128-lane ppermute halo exchange per ≤8-sweep pass
    (parallel.pallas_shard) — multi-chip inherits the single-chip fusion win
    instead of falling back to XLA roll stencils. Replicated levels and
    non-Pallas configs use the XLA path.

    ``from_zero``: the caller guarantees u ≡ 0 (a freshly-reset correction
    level); the first Jacobi sweep is then closed-form — u₁ = −(ω/4)h²f on
    the interior — and the Pallas kernel skips reading u from HBM entirely.
    """
    if cfg.smoother == "jacobi":
        if _use_pallas(cfg) and (policy is None or not policy.is_sharded(n)):
            # single-chip or replicated-under-policy levels: the plain fused
            # kernel (GSPMD replicates the custom call per device, exactly
            # like the XLA ops it replaces)
            from .ops.pallas_kernels import fused_jacobi_padded
            return fused_jacobi_padded(u, f, n, h, steps, omega=cfg.omega,
                                       from_zero=from_zero,
                                       interpret=_pallas_interpret())
        if _use_pallas(cfg) and steps > 0:
            spec = policy.spec(n)
            if (cfg.halo == "rdma" and len(spec) >= 1 and spec[0] is not None
                    and (len(spec) < 2 or spec[1] is None)):
                # in-kernel inter-chip halo DMAs overlapped with interior
                # compute (1-D row partitions); bit-matches the ppermute path
                from .parallel.pallas_shard import rdma_fused_jacobi
                return rdma_fused_jacobi(u, f, n, h, steps, cfg.omega, policy,
                                         from_zero=from_zero,
                                         interpret=_pallas_interpret())
            from .parallel.pallas_shard import sharded_fused_jacobi
            return sharded_fused_jacobi(u, f, n, h, steps, cfg.omega, policy,
                                        from_zero=from_zero,
                                        interpret=_pallas_interpret())
        sweep = partial(P.jacobi_sweep_p, h=h, n=n, omega=cfg.omega)
        if from_zero and steps >= 1:
            from .ops.layout import interior_mask
            u = jnp.where(interior_mask(n, u.shape),
                          (-0.25 * cfg.omega * h * h) * f,
                          jnp.zeros_like(u))
            steps -= 1
    else:
        # rb-GS: the Pallas strip kernel runs the colored half-sweep pairs
        # (ops.pallas_kernels.fused_rbgs_padded, ≤4 sweeps per HBM pass;
        # reference analog ker_GaussSeideleven/odd_GPU,
        # MG_solver_GPU.cu:663-795) — single-chip and per-shard
        if _use_pallas(cfg) and (policy is None or not policy.is_sharded(n)):
            from .ops.pallas_kernels import fused_rbgs_padded
            return fused_rbgs_padded(u, f, n, h, steps, from_zero=from_zero,
                                     interpret=_pallas_interpret())
        if _use_pallas(cfg) and steps > 0:
            from .parallel.pallas_shard import sharded_fused_jacobi
            return sharded_fused_jacobi(u, f, n, h, steps, 1.0, policy,
                                        from_zero=from_zero,
                                        interpret=_pallas_interpret(),
                                        smoother="rbgs")
        sweep = partial(P.redblack_gs_sweep_p, h=h, n=n)
    return lax.fori_loop(0, steps, lambda _, v: sweep(v, f), u, unroll=True)


def _trigger_smooth_traced(u, f, h, n: int, cfg: SolverConfig, policy=None):
    """Device-side error-trigger loop (MG_solver_CPU.cpp:194-240): smooth one
    sweep at a time while |err_k − err_{k−1}| > trigger.

    On the single-chip Pallas path each sweep fuses the error reduction into
    the smoothing kernel (ker_Smoothing_GPU's fusion, MG_solver_GPU.cu:640-661)
    — 3 HBM passes per trigger sweep instead of sweep + separate residual.

    With cfg.trigger_batch > 1 (and the fused path available), ``batch``
    sweeps run per HBM pass with per-iterate error partials
    (pallas_kernels.fused_jacobi_errs_padded); the stop test replays the
    reference's slope rule against the batch's error vector after the fact.
    The iterate overshoots the reference's stop point by up to batch − 1
    sweeps — extra smoothing, never less; gated behind the flag."""
    sharded = policy is not None and policy.is_sharded(n)
    fuse_err = _use_pallas(cfg) and (
        cfg.smoother == "jacobi"
        or (cfg.smoother == "rbgs" and cfg.compat_error != "gpu"))
    from .solver import effective_trigger_cap
    max_sweeps = effective_trigger_cap(cfg.max_trigger_sweeps, n)

    if fuse_err and not sharded and cfg.smoother == "jacobi":
        from .ops.pallas_chain import (fused_trigger_stream,
                                       fused_trigger_vmem, trigger_fits,
                                       trigger_stream_fits)
        if trigger_fits(n):
            # the WHOLE trigger loop as one VMEM-resident kernel: no HBM
            # traffic and no dispatch per sweep (the per-pass path below
            # pays ~3 HBM passes each); identical stop rule and metrics.
            # Supersedes trigger_batch at these sizes — exact semantics
            # faster than the batched overshoot.
            return fused_trigger_vmem(u, f, n, h, cfg.trigger, cfg.omega,
                                      cfg.compat_error, max_sweeps,
                                      interpret=_pallas_interpret())
        if trigger_stream_fits(n):
            # next size class (4097²): u + f no longer fit VMEM together,
            # but the ITERATE alone does — keep u resident across the whole
            # loop and stream f in strips once per sweep (one HBM pass +
            # zero dispatch per sweep vs the per-pass path's ~3 + 1)
            return fused_trigger_stream(u, f, n, h, cfg.trigger, cfg.omega,
                                        cfg.compat_error, max_sweeps,
                                        interpret=_pallas_interpret())

    if (fuse_err and isinstance(cfg.trigger_batch, int)
            and cfg.trigger_batch > 1 and cfg.smoother == "jacobi"):
        from .ops.pallas_kernels import (errs_sweep_cap,
                                         fused_jacobi_errs_padded)
        from .parallel.pallas_shard import sharded_fused_jacobi_errs
        B = min(cfg.trigger_batch, errs_sweep_cap(cfg.compat_error))

        def batch_step(v, prev):
            if sharded:
                v, errs = sharded_fused_jacobi_errs(
                    v, f, n, h, B, cfg.omega, cfg.compat_error, policy,
                    interpret=_pallas_interpret())
            else:
                v, errs = fused_jacobi_errs_padded(
                    v, f, n, h, B, omega=cfg.omega, compat=cfg.compat_error,
                    interpret=_pallas_interpret())
            prevs = jnp.concatenate([prev[None], errs[:-1]])
            stop = jnp.abs(errs - prevs) <= cfg.trigger
            found = jnp.any(stop)
            err = jnp.where(found, errs[jnp.argmax(stop)], errs[-1])
            return v, errs[-1], found, err

        # first batch: the reference computes err after sweep 1 but only
        # starts slope-testing at sweep 2 — prev = +inf masks slope 1
        u, last, found, err = batch_step(
            u, jnp.asarray(jnp.inf, cfg.dtype))

        def cond(state):
            _, _, found, _, k = state
            return jnp.logical_and(jnp.logical_not(found),
                                   k < max_sweeps)

        def body(state):
            v, last, _, _, k = state
            v, last, found, err = batch_step(v, last)
            return v, last, found, err, k + B

        u, _, _, err, _ = lax.while_loop(
            cond, body, (u, last, found, err, jnp.asarray(B, jnp.int32)))
        return u, err

    if (fuse_err and sharded and cfg.smoother == "jacobi"
            and cfg.halo == "rdma"):
        spec = policy.spec(n)
        if spec[0] is not None and (len(spec) < 2 or spec[1] is None):
            from .ops.pallas_rdma import rdma_trigger_fits
            from .parallel.pallas_shard import rdma_fused_trigger
            rows_loc = policy.padded_shape(n)[0] // policy.mesh.shape[spec[0]]
            if rdma_trigger_fits(rows_loc, policy.padded_shape(n)[1],
                                 jnp.dtype(cfg.dtype).itemsize):
                # the WHOLE trigger loop in ONE kernel per chip: per-shard
                # u/fc VMEM-resident, remote-DMA halos + in-kernel scalar
                # all-reduce per sweep — zero dispatch and zero XLA
                # collectives per sweep (parallel.pallas_shard
                # .rdma_fused_trigger; bit-matches the per-pass path)
                u_out, err = rdma_fused_trigger(
                    u, f, n, h, cfg.trigger, cfg.omega, cfg.compat_error,
                    max_sweeps, policy, interpret=_pallas_interpret())
                # match the per-pass sharded path's level-error dtype
                # under non-f32 configs (halo modes must agree)
                return u_out, err.astype(cfg.dtype)

    if fuse_err and sharded:
        from .parallel.pallas_shard import sharded_fused_jacobi_err

        def step(v):
            return sharded_fused_jacobi_err(v, f, n, h, 1, cfg.omega,
                                            cfg.compat_error, policy,
                                            interpret=_pallas_interpret(),
                                            smoother=cfg.smoother)
    elif fuse_err and cfg.smoother == "rbgs":
        from .ops.pallas_kernels import fused_rbgs_err_padded

        def step(v):
            return fused_rbgs_err_padded(v, f, n, h, 1,
                                         compat=cfg.compat_error,
                                         interpret=_pallas_interpret())
    elif fuse_err:
        from .ops.pallas_kernels import fused_jacobi_err_padded

        def step(v):
            return fused_jacobi_err_padded(v, f, n, h, 1, omega=cfg.omega,
                                           compat=cfg.compat_error,
                                           interpret=_pallas_interpret())
    else:
        def step(v):
            v_new = _sweeps(v, f, h, n, 1, cfg, policy)
            if cfg.compat_error == "gpu":
                return v_new, P.gpu_smoothing_error_p(v_new, v, h, n)
            return v_new, P.smoothing_error_p(v_new, f, h, n,
                                              compat=cfg.compat_error)

    u, err0 = step(u)

    def cond(state):
        _, _, slope, k = state
        return jnp.logical_and(slope > cfg.trigger, k < max_sweeps)

    def body(state):
        u, prev, _, k = state
        u_new, err = step(u)
        return u_new, err, jnp.abs(err - prev), k + 1

    init = (u, err0, jnp.asarray(cfg.trigger + 1.0, err0.dtype),
            jnp.asarray(1, jnp.int32))

    auto = (cfg.trigger_batch == "auto" and fuse_err
            and cfg.smoother == "jacobi")
    if auto and sharded:
        # a sharded level auto-batches only where its single-chip twin
        # would too (above the whole-loop kernel tiers) — the sharded run
        # must not silently trade the exact stop semantics the unsharded
        # engine keeps (cross-policy bit-match contract)
        from .ops.pallas_chain import trigger_fits, trigger_stream_fits
        auto = not (trigger_fits(n) or trigger_stream_fits(n))
    if not auto:
        u, err, _, _ = lax.while_loop(cond, body, init)
        return u, err

    # AUTO two-phase (VERDICT r4 weak 2): the first 2·B sweeps run the
    # EXACT per-sweep loop — an early-stopping level (the measured
    # batch-loses regime) never overshoots and reproduces trigger_batch=1
    # bit-for-bit. A loop still running after the warmup is in the
    # many-sweep regime where batch=B measured ~1.4× (BASELINE "3-D fused
    # error" / exp_trigger_batch.py) — switch to B-sweep batched passes
    # with the per-iterate error replay of the explicit-batch path.
    from .ops.pallas_kernels import errs_sweep_cap, fused_jacobi_errs_padded
    from .parallel.pallas_shard import sharded_fused_jacobi_errs
    B = errs_sweep_cap(cfg.compat_error)
    warm = min(2 * B, max_sweeps)

    def cond1(state):
        _, _, slope, k = state
        return jnp.logical_and(slope > cfg.trigger, k < warm)

    u1, err1, slope1, k1 = lax.while_loop(cond1, body, init)
    done = jnp.logical_or(slope1 <= cfg.trigger, k1 >= max_sweeps)

    def batch_step(v, prev):
        if sharded:
            v, errs = sharded_fused_jacobi_errs(
                v, f, n, h, B, cfg.omega, cfg.compat_error, policy,
                interpret=_pallas_interpret())
        else:
            v, errs = fused_jacobi_errs_padded(
                v, f, n, h, B, omega=cfg.omega, compat=cfg.compat_error,
                interpret=_pallas_interpret())
        prevs = jnp.concatenate([prev[None], errs[:-1]])
        stop = jnp.abs(errs - prevs) <= cfg.trigger
        found = jnp.any(stop)
        err = jnp.where(found, errs[jnp.argmax(stop)], errs[-1])
        return v, errs[-1], found, err

    def phase2(args):
        v, e1, k = args

        def cond2(state):
            _, _, found, _, kk = state
            return jnp.logical_and(jnp.logical_not(found), kk < max_sweeps)

        def body2(state):
            v, last, _, _, kk = state
            v, last, found, err = batch_step(v, last)
            return v, last, found, err, kk + B

        v, last, found, err = batch_step(v, e1)
        v, _, _, err, _ = lax.while_loop(
            cond2, body2, (v, last, found, err, k + B))
        return v, err

    return lax.cond(done, lambda a: (a[0], a[1]), phase2, (u1, err1, k1))


def _smooth_traced(u, f, h, n: int, steps: int, cfg: SolverConfig,
                   want_err: bool, policy=None, from_zero: bool = False):
    if steps == -1:
        return _trigger_smooth_traced(u, f, h, n, cfg, policy)
    fuse_err_ok = (cfg.smoother == "jacobi"
                   or (cfg.smoother == "rbgs" and cfg.compat_error != "gpu"))
    if want_err and steps >= 1 and fuse_err_ok and _use_pallas(cfg):
        # Pallas path: error reduction fused into the smoother's last HBM
        # pass (zero extra traffic); sharded levels psum the per-shard
        # partials (parallel.pallas_shard). rbgs fuses the cpu/clean
        # metrics; its gpu metric needs the final full-sweep ping-pong pair
        # (destroyed by the in-place color halves) so it takes the generic
        # two-call form below.
        if policy is not None and policy.is_sharded(n):
            from .parallel.pallas_shard import sharded_fused_jacobi_err
            return sharded_fused_jacobi_err(u, f, n, h, steps, cfg.omega,
                                            cfg.compat_error, policy,
                                            from_zero=from_zero,
                                            interpret=_pallas_interpret(),
                                            smoother=cfg.smoother)
        if cfg.smoother == "rbgs":
            from .ops.pallas_kernels import fused_rbgs_err_padded
            return fused_rbgs_err_padded(u, f, n, h, steps,
                                         compat=cfg.compat_error,
                                         from_zero=from_zero,
                                         interpret=_pallas_interpret())
        from .ops.pallas_kernels import fused_jacobi_err_padded
        return fused_jacobi_err_padded(u, f, n, h, steps, omega=cfg.omega,
                                       compat=cfg.compat_error,
                                       from_zero=from_zero,
                                       interpret=_pallas_interpret())
    if want_err and cfg.compat_error == "gpu" and steps >= 1:
        # the GPU metric needs the final sweep's ping-pong pair: fuse the
        # first steps−1 sweeps, keep the pre-final iterate, sweep once more
        u_prev = (u if steps == 1 else
                  _sweeps(u, f, h, n, steps - 1, cfg, policy,
                          from_zero=from_zero))
        u = _sweeps(u_prev, f, h, n, 1, cfg, policy,
                    from_zero=from_zero and steps == 1)
        return u, P.gpu_smoothing_error_p(u, u_prev, h, n)
    u = _sweeps(u, f, h, n, steps, cfg, policy, from_zero=from_zero)
    err = (P.smoothing_error_p(u, f, h, n, compat=cfg.compat_error)
           if want_err else None)
    return u, err


def _coarse_solve_traced(f_pad, h, n: int, ins: CoarseSolve, cfg: SolverConfig,
                         policy=None):
    """Exact solve on the (tiny) coarsest level: unpad → solve → repad.

    Coarse grids are far below the tile-alignment scales, so the slice/pad
    round-trip is noise; the solvers themselves are unchanged
    (doExactSolver options, MG_solver_CPU.cpp:627-638)."""
    f = unpad_grid(f_pad, n)
    if ins.option == 0:
        u = coarse_ops.dense_solve(f, h)
    else:
        # option 1 is the reference's fp64 GS (doExactSolver_GPU option 1,
        # MG_solver_GPU.cu:1296): run in float64 when x64 is enabled,
        # otherwise in the configured dtype (where the compensated metric +
        # stagnation stop handle the fp32 floor); option 2 is explicit fp32
        if ins.option == 2:
            dt = jnp.float32
        elif ins.option == 1 and jax.config.jax_enable_x64:
            dt = jnp.float64
        else:
            dt = cfg.dtype
        u, _, _ = coarse_ops.gauss_seidel_solve(
            f.astype(dt), h, ins.target_error, norm=cfg.coarse_gs_norm)
        u = u.astype(cfg.dtype)
    return pad_grid_to(u, _pshape(n, policy))


def _match_chain(instructions, i: int, n0: int, cfg: SolverConfig,
                 policy, finest: bool):
    """Match a pure V-shaped sub-pattern starting at instruction ``i``:
    Descend×c (fixed steps, 2:1-aligned all the way), CoarseSolve, Ascend×c
    — the shape ops.pallas_chain runs as TWO VMEM-resident kernels. Returns
    (sizes, pre_steps, post_steps, solve_ins, next_i) or None.

    Guards: Pallas+jacobi only; trigger (−1) and FMG (0) descents never
    chain; every level must be replicated (un-sharded) under the policy;
    the whole ladder must fit the chain VMEM budget; the finest-entry case
    needs a recomputable error metric (cpu/clean — the gpu ping-pong metric
    can't be recovered post-hoc)."""
    if cfg.smoother != "jacobi" or not _use_pallas(cfg):
        return None
    if finest and cfg.compat_error == "gpu":
        return None
    sizes, pre = [n0], []
    j = i
    while j < len(instructions) and isinstance(instructions[j], Descend):
        d = instructions[j]
        if d.steps <= 0 or d.next_n != (sizes[-1] + 1) // 2:
            return None
        pre.append(d.steps)
        sizes.append(d.next_n)
        j += 1
    if not pre or j >= len(instructions) \
            or not isinstance(instructions[j], CoarseSolve):
        return None
    solve_ins = instructions[j]
    j += 1
    post = []
    while (j < len(instructions) and len(post) < len(pre)
           and isinstance(instructions[j], Ascend)):
        if instructions[j].steps == -1:
            return None
        post.append(instructions[j].steps)
        j += 1
    if len(post) != len(pre):
        return None
    sizes = tuple(sizes)
    if policy is not None and any(policy.is_sharded(m) for m in sizes):
        return None
    from .ops.pallas_chain import chain_fits
    if not chain_fits(sizes):
        return None
    # instruction order ascends coarse→fine; chain wants per-LEVEL steps
    return sizes, tuple(pre), tuple(reversed(post)), solve_ins, j


def _run_traced(u0, f0, *, program: CycleProgram, problem: Problem,
                config: SolverConfig, policy: Optional[ShardingPolicy],
                warm: bool):
    """Trace the full instruction sequence on padded arrays.

    Returns (u_finest_padded, last_err) where last_err is the most recent
    finest-level smoothing error (device scalar, no extra passes)."""
    cfg = config
    finest_spec = GridSpec(program.n_max, program.length,
                           program.min_x, program.min_y)
    levels = [_TraceLevel(finest_spec, u0, f0)]
    warm_now = warm
    last_err = jnp.asarray(0.0, cfg.dtype)

    def boundary_pad(spec):
        return pad_grid_to(problem.boundary_grid(spec, cfg.dtype),
                           _pshape(spec.n, policy))

    def zeros_pad(spec):
        return jnp.zeros(_pshape(spec.n, policy), cfg.dtype)

    instructions = program.instructions
    i = 0
    while i < len(instructions):
        ins = instructions[i]
        i += 1
        lvl = levels[-1]
        n, h = lvl.spec.n, lvl.spec.h

        if isinstance(ins, Descend):
            finest = len(levels) == 1
            was_zeroed = False
            if not (finest and warm_now) and not lvl.is_fmg:
                # reference memset semantics (MG_solver_CPU.cpp:209-214)
                lvl.u = _constrain(
                    boundary_pad(lvl.spec) if finest else zeros_pad(lvl.spec),
                    policy, n)
                was_zeroed = not finest   # correction levels reset to u ≡ 0

            chain = _match_chain(instructions, i - 1, n, cfg, policy, finest)
            if chain is not None:
                # the whole V-shaped remainder below this level fits in
                # VMEM: run it as TWO kernels (descend chain + ascend chain)
                # around the XLA coarse solve — the iterate u is
                # bit-identical to the per-level fused path
                # (ops.pallas_chain, tested); the finest ERROR fuses into
                # the ascend chain kernel (extra in-VMEM Δ, the same
                # identity as fused_jacobi_err_padded — ADVICE r3 item 4),
                # falling back to a post-hoc metric pass only for
                # 0-post-sweep finest entries
                from .ops.pallas_chain import (fused_chain_ascend,
                                               fused_chain_descend)
                sizes, pre, post, solve_ins, i = chain
                u_list, f_list = fused_chain_descend(
                    lvl.u, lvl.f, sizes, h, pre, cfg.omega,
                    restriction=cfg.restriction,
                    entry_from_zero=was_zeroed,
                    interpret=_pallas_interpret())
                depth = len(sizes) - 1
                uc = _coarse_solve_traced(
                    f_list[-1], h * (2 ** depth), sizes[-1], solve_ins, cfg,
                    policy=None)
                fuse_chain_err = finest and post[0] != 0
                res = fused_chain_ascend(
                    u_list, [lvl.f] + f_list[:-1], uc, sizes, h, post,
                    cfg.omega, interpret=_pallas_interpret(),
                    compat=cfg.compat_error if fuse_chain_err else None)
                if fuse_chain_err:
                    u_new, last_err = res
                    warm_now = True
                else:
                    u_new = res
                lvl.u = _constrain(u_new, policy, n)
                if finest and not fuse_chain_err:
                    # 0 post-sweeps: the metric is defined after the finest
                    # PRE-smoothing — one post-hoc pass on that iterate
                    last_err = P.smoothing_error_p(u_list[0], lvl.f, h, n,
                                                   compat=cfg.compat_error)
                    warm_now = True
                continue

            next_spec = lvl.spec.coarsened(ins.next_n)
            m = ins.next_n
            if ins.steps == 0:
                # FMG descent: restrict the full RHS, no smoothing
                # (the reference's TODO branch, MG_solver_CPU.cpp:296-299).
                f_c = _zoom(cfg)(lvl.f, n, m, _pshape(m, policy),
                                 zero_boundary=True)
                f_c = f_c + boundary_pad(next_spec)
                levels.append(_TraceLevel(
                    next_spec, _constrain(zeros_pad(next_spec), policy, m),
                    _constrain(f_c, policy, m), is_fmg=True))
                continue

            if _fuse_descend_ok(cfg, policy, n, m, ins.steps):
                # Pallas + 2:1-aligned coarsening: the whole descend leg
                # (sweeps + residual + row-restriction) is ONE strip-
                # pipelined kernel — per shard under a rows policy; only the
                # cheap half-height lane decimation runs in XLA
                if policy is not None:
                    from .parallel.pallas_shard import sharded_fused_descend
                    err_mode = (None if not finest
                                else "gpu" if cfg.compat_error == "gpu"
                                else "cpu" if cfg.compat_error else "clean")
                    lvl.u, dwide, err = sharded_fused_descend(
                        lvl.u, lvl.f, n, h, ins.steps, cfg.omega,
                        cfg.restriction, err_mode, policy,
                        from_zero=was_zeroed, interpret=_pallas_interpret())
                else:
                    from .ops.pallas_kernels import fused_descend_padded
                    lvl.u, dwide, err = fused_descend_padded(
                        lvl.u, lvl.f, n, h, ins.steps, omega=cfg.omega,
                        restriction=cfg.restriction, compat=cfg.compat_error,
                        want_err=finest, from_zero=was_zeroed,
                        interpret=_pallas_interpret())
                f_c = _constrain(
                    P.restrict_lanes_p(dwide, n, m, _pshape(m, policy)),
                    policy, m)
            else:
                lvl.u, err = _smooth_traced(lvl.u, lvl.f, h, n, ins.steps,
                                            cfg, want_err=finest,
                                            policy=policy,
                                            from_zero=was_zeroed)
                lvl.u = _constrain(lvl.u, policy, n)
                d = _residual(lvl.u, lvl.f, h, n, cfg, policy)
                f_c = _restrict(d, n, m, cfg, policy)
            if finest and err is not None:
                last_err = err
            levels.append(_TraceLevel(
                next_spec, _constrain(zeros_pad(next_spec), policy, m),
                _constrain(f_c, policy, m)))

        elif isinstance(ins, CoarseSolve):
            lvl.u = _constrain(
                _coarse_solve_traced(lvl.f, h, n, ins, cfg, policy),
                policy, n)

        elif isinstance(ins, Ascend):
            child = levels.pop()
            lvl = levels[-1]
            n, h = lvl.spec.n, lvl.spec.h
            if len(levels) == 1:
                warm_now = True
            finest = len(levels) == 1
            if _fuse_ascend_ok(cfg, policy, n, child.spec.n, ins.steps,
                               finest):
                # Pallas + 2:1 alignment: lane-expand the coarse solution
                # (cheap half-height XLA pass), then ONE kernel does row-
                # prolongation + interior add + post-sweeps (+ error) — per
                # shard under a rows policy
                rp, cpn = _pshape(n, policy)
                if policy is not None:
                    from .parallel.pallas_shard import sharded_fused_ascend
                    cwide = _constrain(
                        P.prolong_lanes_p(child.u, child.spec.n, n,
                                          (rp // 2, cpn)), policy, n)
                    err_mode = (None if not finest
                                else "gpu" if cfg.compat_error == "gpu"
                                else "cpu" if cfg.compat_error else "clean")
                    lvl.u, err = sharded_fused_ascend(
                        lvl.u, lvl.f, cwide, n, h, ins.steps, cfg.omega,
                        err_mode, policy, interpret=_pallas_interpret())
                else:
                    from .ops.pallas_kernels import fused_ascend_padded
                    cwide = P.prolong_lanes_p(child.u, child.spec.n, n,
                                              (rp // 2 + 8, cpn))
                    lvl.u, err = fused_ascend_padded(
                        lvl.u, lvl.f, cwide, n, h, ins.steps, omega=cfg.omega,
                        compat=cfg.compat_error, want_err=finest,
                        interpret=_pallas_interpret())
                if finest and err is not None:
                    last_err = err
                continue
            corr = _zoom(cfg)(child.u, child.spec.n, n,
                              _pshape(n, policy))
            lvl.u = _constrain(P.add_correction_p(lvl.u, corr, n), policy, n)
            if ins.steps != 0:
                lvl.u, err = _smooth_traced(lvl.u, lvl.f, h, n, ins.steps,
                                            cfg, want_err=finest,
                                            policy=policy)
                lvl.u = _constrain(lvl.u, policy, n)
                if finest and err is not None:
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
