"""Probe the lane-direction VMEM-DMA granularity law on real hardware.

The round-4 loopback run established the ROW law: VMEM DMA slices of 2-D
(8,128)-tiled refs need 8-row-aligned offset AND size (a (1, cp) edge-row
copy is rejected at lowering), making 8 rows the RDMA wire granularity
floor for row halos. The 2-D block policy's COLUMN halos would ship
(rows_loc, 128) lane slabs instead — this probe asks Mosaic whether such
slices lower, locally and as remote DMAs (loopback), at:

  * lane offset 0 and cp-128 (the halo positions, x128-aligned), and
  * a misaligned lane offset / sub-128 width (expected rejections,
    confirming 128 lanes as the lane-direction granularity floor).

Run:  python -u examples/exp_lane_dma_probe.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, CP = 64, 512


def _copy_kernel(u_hbm, out_hbm, buf, halo, sem, dsem, *, src0, dst0, w):
    # HBM -> VMEM, slice the lane slab VMEM->VMEM, write back
    pltpu.make_async_copy(u_hbm, buf, sem).start()
    pltpu.make_async_copy(u_hbm, buf, sem).wait()
    pltpu.make_async_copy(buf.at[:, pl.ds(src0, w)], halo, dsem).start()
    pltpu.make_async_copy(buf.at[:, pl.ds(src0, w)], halo, dsem).wait()
    buf[:, dst0:dst0 + w] = halo[:, :]
    pltpu.make_async_copy(buf, out_hbm, sem).start()
    pltpu.make_async_copy(buf, out_hbm, sem).wait()


def try_case(name, src0, dst0, w):
    u = jnp.asarray(np.random.default_rng(0).random((ROWS, CP)), jnp.float32)
    try:
        out = pl.pallas_call(
            lambda a, b, buf, halo, sem, dsem: _copy_kernel(
                a, b, buf, halo, sem, dsem, src0=src0, dst0=dst0, w=w),
            out_shape=jax.ShapeDtypeStruct((ROWS, CP), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((ROWS, CP), jnp.float32),
                            pltpu.VMEM((ROWS, w), jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(u)
        want = np.array(u)
        want[:, dst0:dst0 + w] = want[:, src0:src0 + w]
        md = float(np.abs(np.asarray(out) - want).max())
        print(f"[{name}] OK maxdiff={md:.1e}", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:100]
        print(f"[{name}] REJECTED: {msg}", flush=True)
        return False


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    # the halo shapes the block policy would ship
    try_case("lane slab 128 @0 -> cp-128", 0, CP - 128, 128)
    try_case("lane slab 128 @cp-128 -> 0", CP - 128, 0, 128)
    # granularity probes (expected rejections)
    try_case("lane slab 64 @0", 0, CP - 64, 64)
    try_case("lane slab 128 @64 (misaligned)", 64, 256, 128)


if __name__ == "__main__":
    main()
