"""Smoother VPU-wall probe (VERDICT r3 item 3): per-op costs at strip shape.

Times kernel-body candidates in isolation on the real chip — everything runs
K iterations on a VMEM-resident (STRIP, CP) block inside ONE pallas kernel
(no HBM traffic in the loop).

MEASURED CAVEATS (2026-08-19, v5e): (1) single-op rows all bottom out at the
same ~0.002 ms/iter — the ping-pong VMEM buffer-write floor (~2.8 TB/s for a
5.6 MB strip), so they measure the copy floor, NOT op cost; only the
relative ordering of the composite sweep rows is informative. (2) per-call
times here are sub-ms, below the tunnel's reliable differential-timing
threshold (see ROADMAP probe-protocol warning) — treat any conclusion from
this probe as a hypothesis to confirm with an end-to-end A/B on the real
kernel (the definitive protocol; see pallas_kernels._SWEEP_FORM for the
canonicalization result found that way).

  roll_r        one ±1 sublane (row) roll
  roll_c        one ±1 lane (col) roll
  add           one elementwise add
  sweep_v0      the production sweep body (4 rolls + FMA chain)
  sweep_v1      algebraically reduced body: dst = a·nb + (b·u − C) with
                b = 1 − 4a precomputed per strip (one fewer mult+sub)
  mxu_band_r    row-neighbor sum as a (STRIP,STRIP) band matmul,
                fp32 dot HIGHEST on the (otherwise idle) MXU
  sweep_mxu_rows  rows on the MXU band matmul, lanes on VPU rolls

Run: python examples/exp_vpu_probe.py            (on the tunneled TPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

STRIP, CP = 168, 8320          # the 32 MiB-budget strip at N=8193
K = 32                         # in-VMEM iterations per kernel call (python-
                               # unrolled; 128 made the sweep variants take
                               # >30 min of remote compile)


def _consts():
    """Per-strip coefficient fields, built IN-KERNEL (pallas kernels cannot
    capture tracer constants)."""
    a = jnp.full((STRIP, CP), jnp.float32(0.25 * 0.9))
    b = 1.0 - 4.0 * a
    C = jnp.full((STRIP, CP), jnp.float32(1e-3))
    r = jax.lax.broadcasted_iota(jnp.int32, (STRIP, STRIP), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (STRIP, STRIP), 1)
    band = ((r == c + 1) | (c == r + 1)).astype(jnp.float32)
    return {"a": a, "b": b, "C": C, "band": band,
            "i1": jnp.int32(1), "rm1": jnp.int32(STRIP - 1),
            "cm1": jnp.int32(CP - 1)}


def _body(op):
    # PING-PONG between two buffers, like the production kernels. An earlier
    # single-buffer in-place form (buf[:] = op(buf[:])) produced numbers up
    # to 3x off — aliasing lets Mosaic lower the update differently than any
    # real sweep — and mislabeled an expression-tree rewrite as a 3.3x win
    # (debunked by a bit-identical end-to-end A/B; see pallas_kernels
    # _SWEEP_FORM).
    def kernel(x_hbm, o_hbm, b0, b1, sem):
        cp_in = pltpu.make_async_copy(x_hbm, b0, sem)
        cp_in.start()
        cp_in.wait()
        k = _consts()
        bufs = [b0, b1]
        for s in range(K):
            bufs[(s + 1) % 2][:] = op(bufs[s % 2][:], k)
        cp_out = pltpu.make_async_copy(bufs[K % 2], o_hbm, sem)
        cp_out.start()
        cp_out.wait()
    return kernel


def probe(name, op):
    x = jnp.asarray(np.random.default_rng(0).random((STRIP, CP)), jnp.float32)
    try:
        fn = jax.jit(lambda x: pl.pallas_call(
            _body(op),
            out_shape=jax.ShapeDtypeStruct((STRIP, CP), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((STRIP, CP), jnp.float32),
                            pltpu.VMEM((STRIP, CP), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x))
        t = DeviceTimer().measure_differential(fn, x, reps=4)
    except Exception as e:  # noqa: BLE001 — record and continue the table
        print(f"{name:>18}: FAILED ({type(e).__name__}: {str(e)[:90]})",
              flush=True)
        return None
    per_iter_ms = t / K * 1e3
    # per-sweep-equivalent at N=8193: strips of (STRIP − 16) owned rows
    n_strips = -(-8320 // (STRIP - 16))
    print(f"{name:>18}: {per_iter_ms:.4f} ms/iter on one strip "
          f"({per_iter_ms * n_strips:.3f} ms/sweep-equivalent x{n_strips})",
          flush=True)
    return per_iter_ms


def nb(u, k):
    return (pltpu.roll(u, shift=k["i1"], axis=0)
            + pltpu.roll(u, shift=k["rm1"], axis=0)
            + pltpu.roll(u, shift=k["i1"], axis=1)
            + pltpu.roll(u, shift=k["cm1"], axis=1))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; strip ({STRIP}, {CP}), K={K}")

    results = {}
    results["roll_r"] = probe(
        "roll_r", lambda u, k: pltpu.roll(u, shift=k["i1"], axis=0))
    results["roll_c"] = probe(
        "roll_c", lambda u, k: pltpu.roll(u, shift=k["i1"], axis=1))
    results["add"] = probe("add", lambda u, k: u + u)
    results["sweep_v0"] = probe(
        "sweep_v0",
        lambda u, k: u + k["a"] * (nb(u, k) - 4.0 * u) - k["C"])
    results["sweep_v1"] = probe(
        "sweep_v1",
        lambda u, k: k["a"] * nb(u, k) + (k["b"] * u - k["C"]))
    results["mxu_band_r"] = probe(
        "mxu_band_r",
        lambda u, k: jax.lax.dot(k["band"], u,
                                 precision=jax.lax.Precision.HIGHEST))
    results["sweep_mxu_rows"] = probe(
        "sweep_mxu_rows",
        lambda u, k: k["a"] * (
            jax.lax.dot(k["band"], u, precision=jax.lax.Precision.HIGHEST)
            + pltpu.roll(u, shift=k["i1"], axis=1)
            + pltpu.roll(u, shift=k["cm1"], axis=1))
        + (k["b"] * u - k["C"]))

    v0 = results.get("sweep_v0")
    if v0:
        print("\nratios vs sweep_v0:")
        for name, v in results.items():
            if v is not None:
                print(f"  {name:>18}: {v / v0:.2f}x")


if __name__ == "__main__":
    main()
