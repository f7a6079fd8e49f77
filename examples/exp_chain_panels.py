"""Banded lane-panel VMEM chains on real TPU (VERDICT r3 item 1).

1. Kernel-level A/B at a 2049 root: descend+ascend chain with the round-3
   DENSE O(cp²) lane matmuls vs the round-4 banded 128-lane block panels
   (O(cp·128)), bit-compare + time.
2. Engine-level cycles: V(3,3) ms/cycle at 2049 (whole-program chain),
   4097 and 8193 (sub-chain below 2049) with the chain disabled /
   root-capped at 1025 (round 3) / 2049 (round 4).

Run:  python -u examples/exp_chain_panels.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

import multigrid_poisson_solver_tpu as mg  # noqa: E402
from multigrid_poisson_solver_tpu.ops import layout  # noqa: E402
from multigrid_poisson_solver_tpu.ops import pallas_chain as ch  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

timer = DeviceTimer()


def fetch(x):
    return float(jax.device_get(x))


def kernel_ab(n0=2049):
    sizes = ch.chain_sizes(n0, 8)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    rp, cp = layout.padded_shape(n0)

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (rp, cp), jnp.float32),
                jax.random.normal(k2, (rp, cp), jnp.float32))

    u0, f0 = build(jax.random.key(0))
    outs = {}
    for form in ("panel", "dense"):
        def subcycle(u, f, form=form):
            du, df = ch.fused_chain_descend(
                u, f, sizes, h0, tuple([3] * c), 0.8,
                restriction="sampling", lane_form=form)
            uc = jnp.zeros(layout.padded_shape(sizes[-1]), jnp.float32)
            return ch.fused_chain_ascend(du, [f] + df[:-1], uc, sizes, h0,
                                         tuple([3] * c), 0.8, lane_form=form)

        fn = jax.jit(subcycle)
        t0 = time.perf_counter()
        out = fn(u0, f0)
        _ = fetch(jnp.sum(out[:8, :8]))
        print(f"[chain-kernel] {form} compile+run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        outs[form] = out
        t = timer.measure_differential(fn, u0, f0, reps=4)
        print(f"[chain-kernel] {form} root={n0} V(3,3) sub-cycle: "
              f"{t*1e3:.3f} ms", flush=True)
    md = fetch(jnp.max(jnp.abs(outs["panel"] - outs["dense"])))
    print(f"[chain-kernel] panel vs dense maxdiff {md:.3e}", flush=True)


def engine_cycles(n, roots=(9, 1025, 2049), iters=10):
    cfg = mg.SolverConfig(omega=0.8, collect_node_stats=False)
    program = mg.v_cycle(n, n_min=8, steps=3, coarse_option=0, coarsen=3)
    finals = {}
    for root in roots:
        ch.CHAIN_MAX_ROOT = root
        cold = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                  donate=False)
        warm = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                  donate=False, warm=True)
        u0, f0 = cold.init()
        run = jax.jit(lambda a, b: jax.lax.fori_loop(
            0, iters, lambda i, v: warm.fn(v, b)[0], cold.fn(a, b)[0]))
        t0 = time.perf_counter()
        out = run(u0, f0)
        _ = fetch(jnp.sum(out[:8, :8]))
        print(f"[engine] N={n} root-cap={root} compile+run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        finals[root] = out
        t = timer.measure_differential(run, u0, f0, reps=3) / (iters + 1)
        print(f"[engine] N={n} chain-root-cap={root}: {t*1e3:.3f} ms/cycle",
              flush=True)
    ks = list(finals)
    for k in ks[1:]:
        md = fetch(jnp.max(jnp.abs(finals[k] - finals[ks[0]])))
        print(f"[engine] N={n} cap {k} vs {ks[0]}: maxdiff {md:.3e}",
              flush=True)


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    kernel_ab()
    engine_cycles(2049)
    engine_cycles(4097)
    engine_cycles(8193, iters=6)
