"""Mosaic compile/run check for the RDMA halo-overlap smoother on real TPU.

Multi-chip hardware is unavailable in this environment (one v5e chip behind
the axon tunnel), so this exercises the REAL Mosaic lowering of
ops.pallas_rdma — remote-DMA descriptors, semaphore allocation, the strip
schedule — on a 1-device mesh, where the ring has no neighbors and the
kernel must produce exactly the single-chip fused-smoother result. The
multi-device data path is validated separately under the full TPU
interpreter (tests/test_rdma.py, 8-virtual-device CPU mesh, remote DMAs +
semaphores simulated with race detection).

Run:  python examples/exp_rdma_tpu.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.ops import layout
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk
from multigrid_poisson_solver_tpu.ops.pallas_rdma import (
    _rdma_jacobi_shard_call,
    HALO,
)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    n, h, steps = 1025, 1.0 / 1024, 8

    spec = mg.GridSpec(n)
    problem = mg.REFERENCE_PROBLEM
    f = layout.pad_grid(problem.source_grid(spec, jnp.float32)
                        + problem.boundary_grid(spec, jnp.float32))
    u = layout.pad_grid(problem.boundary_grid(spec, jnp.float32))

    # ndev=1 ring: no neighbors, so the kernel zero-fills its halo buffers
    # and must reproduce the single-chip fused smoother bit-for-bit — while
    # still lowering the full remote-DMA/semaphore machinery through Mosaic.
    # The MESH device_id type requires a named mesh axis, so even the
    # 1-device check runs under shard_map.
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("rows",))

    def body(u_loc, f_loc):
        meta = jnp.asarray([-HALO, 0], jnp.int32)
        return _rdma_jacobi_shard_call(
            meta, u_loc, f_loc, n, h, steps, 0.8, from_zero=False, ndev=1,
            interpret=False, axis_name="rows")

    run = jax.jit(shard_map(body, mesh=mesh,
                            in_specs=(P("rows", None), P("rows", None)),
                            out_specs=P("rows", None), check_vma=False))
    got = run(u, f)
    want = pk.fused_jacobi_padded(u, f, n, h, steps, omega=0.8)
    g, w = np.asarray(jax.device_get(got)), np.asarray(jax.device_get(want))
    assert (g == w).all(), float(np.abs(g - w).max())
    print(f"RDMA kernel Mosaic-compiled and ran on {dev.device_kind}; "
          f"bit-match vs fused_jacobi_padded at n={n}, steps={steps}: OK")

    # --- the round-4 whole-loop RDMA trigger: same 1-device Mosaic check --
    from multigrid_poisson_solver_tpu.ops.pallas_rdma import (
        _rdma_trigger_shard_call,
    )

    def tbody(u_loc, f_loc):
        meta = jnp.asarray([0, 0], jnp.int32)
        return _rdma_trigger_shard_call(
            meta, u_loc, f_loc, n, h, 0.01, 0.8, True, 40, ndev=1,
            interpret=False, axis_name="rows")

    trun = jax.jit(shard_map(tbody, mesh=mesh,
                             in_specs=(P("rows", None), P("rows", None)),
                             out_specs=(P("rows", None), P()),
                             check_vma=False))
    tu, terr = trun(u, f)

    # reference: the per-pass loop on the same chip
    v, prev, k = u, None, 0
    while True:
        v, e = pk.fused_jacobi_err_padded(v, f, n, h, 1, omega=0.8,
                                          compat=True)
        k += 1
        if prev is not None and abs(float(jax.device_get(e)) - prev) <= 0.01:
            break
        if k >= 40:
            break
        prev = float(jax.device_get(e))
    gt = np.asarray(jax.device_get(tu))
    wv = np.asarray(jax.device_get(v))
    md = float(np.abs(gt - wv).max())
    print(f"RDMA TRIGGER kernel Mosaic-compiled and ran; u maxdiff {md:.3e} "
          f"vs per-pass ({k} sweeps), err {float(jax.device_get(terr)):.6e} "
          f"vs {float(jax.device_get(e)):.6e}")
    assert md == 0.0


if __name__ == "__main__":
    main()
