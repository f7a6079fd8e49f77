"""Profiling and observability helpers.

The reference's entire observability story is two wall-clocks and printf
narration (omp_get_wtime / cudaEvent around the whole cycle,
MG_solver_CPU.cpp:156,429-431; SURVEY.md §5). This module provides the
TPU-native equivalents:

  * ``trace()`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (per-kernel timelines, HBM counters);
  * ``DeviceTimer`` — correct wall-timing against the remote-device tunnel,
    where ``block_until_ready`` returns early and scalar fetches cost ~0.6 s
    (dependent-scalar sync + measured-latency subtraction + differential
    mode; the protocol bench.py uses, packaged for users);
  * ``cost_report()`` — a static per-instruction cost model for a schedule:
    HBM bytes, FLOPs, and roofline-time estimates per level, so measured
    cycle times have a first-principles comparison point.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """``with trace("/tmp/mgtrace"): run(...)`` → TensorBoard profile."""
    jax.profiler.start_trace(log_dir, host_tracer_level=host_tracer_level)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force completion of everything ``x`` depends on (see SKILL.md:
    block_until_ready does not wait on tunneled platforms)."""
    return float(jax.device_get(jnp.sum(jnp.ravel(x)[:1])))


class DeviceTimer:
    """Wall-times device work with latency compensation.

    ``measure(fn, *args)`` runs ``fn`` once to warm/compile, then times it;
    ``measure_differential(fn_n, fn_3n)`` times two runs whose workloads
    differ 3× and returns the per-unit time with all fixed costs cancelled —
    the robust protocol for sub-100 ms kernels behind a slow tunnel.
    """

    def __init__(self):
        self._latency: Optional[float] = None

    @property
    def latency(self) -> float:
        if self._latency is None:
            x = jnp.ones((8, 8))
            sync(x)
            t0 = time.perf_counter()
            for _ in range(3):
                sync(x + 1.0)
            self._latency = (time.perf_counter() - t0) / 3
        return self._latency

    def measure(self, fn: Callable, *args) -> float:
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        elapsed = time.perf_counter() - t0
        return max(elapsed - self.latency, 0.05 * elapsed)

    def measure_differential(self, fn: Callable, *args, reps: int = 10) -> float:
        """Per-call time of ``fn`` via t(3k calls) − t(k calls), fixed costs
        cancelled. ``fn`` must be side-effect free (called repeatedly)."""
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        t1 = time.perf_counter()
        for _ in range(3 * reps):
            out = fn(*args)
        sync(out)
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / (2 * reps)
        # noise floor: when fixed costs dominate (tiny N on CPU) the
        # difference can go negative — report ≥5% of the raw per-call mean
        # instead of a nonsensical negative rate
        return max(d, 0.05 * (t2 - t0) / (4 * reps))

    def measure_differential_median(self, fn: Callable, *args, reps: int = 4,
                                    k: int = 3):
        """Median of ``k`` independent differential measurements, with the
        min–max spread — the noise-robust protocol for benchmark capture.

        A single differential can be poisoned by one slow tunnel sync landing
        inside exactly one of its two timed segments (the failure mode that
        once produced a 14× outlier in a reps=2 capture); the median of k
        independent differentials is immune to any single such event, and the
        spread makes the remaining window noise visible in the report.
        """
        ts = sorted(self.measure_differential(fn, *args, reps=reps)
                    for _ in range(k))
        return ts[k // 2], (ts[0], ts[-1])

    def measure_median(self, fn: Callable, *args, k: int = 3):
        """Median of ``k`` latency-compensated single measures (for one-shot
        calls too big to iterate), plus the min–max spread."""
        ts = sorted(self.measure(fn, *args) for _ in range(k))
        return ts[k // 2], (ts[0], ts[-1])


# --- static cost model --------------------------------------------------------

@dataclasses.dataclass
class NodeCost:
    kind: str
    n: int
    hbm_bytes: int
    flops: int
    roofline_s: float


@dataclasses.dataclass
class CostReport:
    nodes: list[NodeCost]
    total_bytes: int
    total_flops: int
    roofline_s: float

    def summary(self) -> str:
        lines = [f"{'node':<14}{'N':>7}{'MB':>10}{'MFLOP':>10}{'us@roof':>10}"]
        for c in self.nodes:
            lines.append(f"{c.kind:<14}{c.n:>7}{c.hbm_bytes/1e6:>10.2f}"
                         f"{c.flops/1e6:>10.1f}{c.roofline_s*1e6:>10.1f}")
        lines.append(f"total: {self.total_bytes/1e6:.1f} MB, "
                     f"{self.total_flops/1e6:.1f} MFLOP, "
                     f"{self.roofline_s*1e3:.3f} ms at roofline")
        return "\n".join(lines)


def cost_report(program, config=None, hbm_bw: float = 819e9,
                dtype_bytes: int = 4) -> CostReport:
    """Static HBM-traffic/FLOP estimate per schedule instruction.

    Smoothing assumes the fused Pallas kernel (one read of u and f + one
    write of u per ≤8-sweep chunk, plus halo-strip overhead ~1.3×);
    restriction/prolongation assume the gather zoom (read src + write dst,
    two separable passes). Coarse solves are modeled as matmul FLOPs only.
    """
    from ..ops.layout import padded_shape
    from ..schedule import Ascend, CoarseSolve, Descend

    MAX_FUSE = 8
    OVERHEAD = 1.35

    nodes = []
    stack = [program.n_max]

    def level_bytes(n):
        rp, cp = padded_shape(n)
        return rp * cp * dtype_bytes

    def smooth_cost(n, steps):
        if steps <= 0:
            steps = 10  # trigger mode: a nominal count
        chunks = math.ceil(steps / MAX_FUSE)
        b = int(3 * level_bytes(n) * chunks * OVERHEAD)
        fl = 8 * n * n * steps
        return b, fl

    for ins in program.instructions:
        n = stack[-1]
        if isinstance(ins, Descend):
            if ins.steps == 0:
                b, fl = 0, 0
            else:
                b, fl = smooth_cost(n, ins.steps)
            # residual + restrict
            b += int(3 * level_bytes(n) + 2 * level_bytes(ins.next_n)) * 2
            fl += 7 * n * n + 6 * ins.next_n * ins.next_n
            nodes.append(NodeCost("descend", n, b, fl, b / hbm_bw))
            stack.append(ins.next_n)
        elif isinstance(ins, CoarseSolve):
            fl = 2 * (n * n) ** 2 if ins.option == 0 else 100 * 10 * n * n
            b = 2 * level_bytes(n)
            nodes.append(NodeCost("coarse", n, b, fl, b / hbm_bw))
        elif isinstance(ins, Ascend):
            stack.pop()
            n = stack[-1]
            b = int(2 * level_bytes(n) * 2)
            fl = 6 * n * n
            if ins.steps != 0:
                sb, sf = smooth_cost(n, ins.steps)
                b += sb
                fl += sf
            nodes.append(NodeCost("ascend", n, b, fl, b / hbm_bw))

    tb = sum(c.hbm_bytes for c in nodes)
    tf = sum(c.flops for c in nodes)
    return CostReport(nodes=nodes, total_bytes=tb, total_flops=tf,
                      roofline_s=tb / hbm_bw)
