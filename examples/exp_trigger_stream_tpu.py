"""u-resident/f-streamed trigger loop on real TPU (VERDICT r3 item 4).

At 4097² the pure in-VMEM trigger is physically impossible (u + f alone
exceed the 128 MiB VMEM), so the streamed kernel keeps ONLY the iterate
resident and streams f strips once per sweep. This measures:
1. bit-match vs the per-pass fused-err loop (the engine's fallback path),
   same stop rule, watchdog-capped so both run the same sweep count;
2. the wall A/B of the two loops.

Run:  python -u examples/exp_trigger_stream_tpu.py
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
from multigrid_poisson_solver_tpu.ops import pallas_chain as pc  # noqa: E402
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

timer = DeviceTimer()
N = 4097
H = 1.0 / (N - 1)
TRIG = 0.01
CAP = 50          # both paths cap-bound -> identical sweep counts
COMPAT = True


def fetch(x):
    return float(jax.device_get(x))


def per_pass(u, f):
    """The engine's per-pass trigger loop (compiled._trigger_smooth_traced's
    fallback): one fused-err pass per sweep, same stop rule."""
    u, err0 = pk.fused_jacobi_err_padded(u, f, N, H, 1, omega=0.8,
                                         compat=COMPAT)

    def cond(s):
        _, _, slope, k = s
        return jnp.logical_and(slope > TRIG, k < CAP)

    def body(s):
        u, prev, _, k = s
        u, err = pk.fused_jacobi_err_padded(u, f, N, H, 1, omega=0.8,
                                            compat=COMPAT)
        return u, err, jnp.abs(err - prev), k + 1

    u, err, _, _ = jax.lax.while_loop(
        cond, body, (u, err0, jnp.asarray(TRIG + 1.0, err0.dtype),
                     jnp.asarray(1, jnp.int32)))
    return u, err


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rp, cp = layout.padded_shape(N)
    print(f"stream fits: {pc.trigger_stream_fits(N)}, "
          f"S={pc._stream_strip_rows(rp, cp)}", flush=True)

    spec = mg.GridSpec(N)
    prob = mg.REFERENCE_PROBLEM

    @jax.jit
    def build():
        f = layout.pad_grid(prob.source_grid(spec, jnp.float32)
                            + prob.boundary_grid(spec, jnp.float32))
        u = layout.pad_grid(prob.boundary_grid(spec, jnp.float32))
        return u, f

    u, f = build()

    fn_s = jax.jit(lambda a, b: pc.fused_trigger_stream(
        a, b, N, H, TRIG, 0.8, COMPAT, CAP))
    fn_p = jax.jit(per_pass)

    t0 = time.perf_counter()
    us, es = fn_s(u, f)
    _ = fetch(jnp.sum(us[:8, :8]))
    print(f"[stream] compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    up, ep = fn_p(u, f)
    _ = fetch(jnp.sum(up[:8, :8]))
    print(f"[per-pass] compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)

    md = fetch(jnp.max(jnp.abs(us - up)))
    print(f"[match] u maxdiff {md:.3e}; err {fetch(es):.6e} vs "
          f"{fetch(ep):.6e}", flush=True)

    # DeviceTimer syncs on an array; time u-only wrappers. The reference
    # trigger at this state stops after 2 sweeps (slope ≤ 0.01 immediately),
    # so also time a cap-bound loop (trigger 1e-9 → exactly CAP sweeps) for
    # the steady-state per-sweep cost.
    fn_s1 = jax.jit(lambda a, b: fn_s(a, b)[0])
    fn_p1 = jax.jit(lambda a, b: fn_p(a, b)[0])
    ts = timer.measure_differential(fn_s1, u, f, reps=3)
    tp = timer.measure_differential(fn_p1, u, f, reps=3)
    print(f"[time] N={N} reference trigger loop (2 sweeps): stream "
          f"{ts*1e3:.2f} ms vs per-pass {tp*1e3:.2f} -> {tp/ts:.2f}x",
          flush=True)

    global TRIG
    TRIG = 1e-9
    fn_s2 = jax.jit(lambda a, b: pc.fused_trigger_stream(
        a, b, N, H, 1e-9, 0.8, COMPAT, CAP)[0])

    def per_pass_capped(u, f):
        u, err0 = pk.fused_jacobi_err_padded(u, f, N, H, 1, omega=0.8,
                                             compat=COMPAT)

        def cond(s):
            _, _, slope, k = s
            return jnp.logical_and(slope > 1e-9, k < CAP)

        def body(s):
            u, prev, _, k = s
            u, err = pk.fused_jacobi_err_padded(u, f, N, H, 1, omega=0.8,
                                                compat=COMPAT)
            return u, err, jnp.abs(err - prev), k + 1

        u, err, _, _ = jax.lax.while_loop(
            cond, body, (u, err0, jnp.asarray(2.0, err0.dtype),
                         jnp.asarray(1, jnp.int32)))
        return u

    fn_p2 = jax.jit(per_pass_capped)
    ts2 = timer.measure_differential(fn_s2, u, f, reps=3)
    tp2 = timer.measure_differential(fn_p2, u, f, reps=3)
    print(f"[time] N={N} cap-bound {CAP}-sweep loop: stream {ts2*1e3:.2f} ms"
          f" ({ts2/CAP*1e3:.3f}/sweep) vs per-pass {tp2*1e3:.2f} "
          f"({tp2/CAP*1e3:.3f}/sweep) -> {tp2/ts2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
