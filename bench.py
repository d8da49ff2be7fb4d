"""Headline benchmark: 3D r2c+c2r round-trip on the available TPU.

Driver metric (BASELINE.json): "3D r2c+c2r round-trip time at 256^3/1024^3;
transpose GB/s/chip".  On a single chip the transform is the serial fast path;
on a multi-chip mesh the slab/pencil transposes engage automatically.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup of this framework's round trip vs raw XLA
``jnp.fft.rfftn``+``irfftn`` on identical hardware (the reference's own serial
backend strategy transplanted to TPU) — >1.0 means we beat the stock path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _timeit(fn, x, iters=50):
    """Per-iteration device time of x -> fn(x), measured as a data-dependent
    in-jit chain ending in a scalar fetch.

    Two axon-relay gotchas this sidesteps: block_until_ready() returns before
    remote execution finishes (only a host fetch truly syncs), and each
    dispatch carries ~3 ms of relay overhead (amortised by chaining in-graph).
    iters=50: the one-chain fixed cost is ~15 ms on the relay, so 20 iters
    overstated per-iteration time by ~0.45 ms at 256³ (BENCH.md round 4).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    chain = jax.jit(lambda v: jnp.sum(
        lax.scan(lambda c, _: (fn(c), None), v, None, length=iters)[0]))
    float(chain(x))  # warm: compile + execute once
    t0 = time.perf_counter()
    s = float(chain(x))
    dt = (time.perf_counter() - t0) / iters
    assert s == s, "NaN in benchmark chain"
    return dt


def _backend_watchdog(seconds: float = 300.0):
    """Fail fast (instead of hanging indefinitely) when the TPU relay is
    down: backend init blocks in C and ignores env overrides (the axon
    sitecustomize reads JAX_PLATFORMS before user code runs), so probe it
    from a daemon thread and hard-exit on timeout."""
    import threading

    done = threading.Event()

    def probe():
        import jax
        jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(seconds):
        print(json.dumps({
            "metric": "3d_r2c_c2r_roundtrip_unavailable",
            "value": 0.0, "unit": "ms", "vs_baseline": 0.0,
            "error": f"backend init did not complete in {seconds:.0f}s "
                     "(TPU relay unavailable)"}))
        os._exit(3)


def main():
    _backend_watchdog()
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu.slab import R2C
    try:  # FFTW-wisdom analog: persistent compile cache (495s -> 1.4s warm).
        # TPU only — CPU AOT entries embed machine features (SIGILL risk).
        if jax.default_backend() == "tpu":
            from mpifft4py_tpu.utils.cache import enable_wisdom_cache
            enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                               "/tmp/mpifft4py_tpu_cache"))
    except Exception:
        pass

    n = int(os.environ.get("BENCH_N", "256"))
    N = np.array([n, n, n])
    L = np.array([2 * np.pi] * 3)
    ndev = len(jax.devices())
    FFT = R2C(N, L, None, "single")

    u = FFT.shard_real(np.random.default_rng(0).standard_normal(tuple(N)).astype(np.float32))

    fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
    t_ours = _timeit(lambda v: bwd(fwd(v)), u)

    # Baseline: stock XLA FFT (what a naive JAX port of the reference would do).
    # Multi-device: the same jnp.fft program jitted over the same sharded input
    # (GSPMD inserts its own collectives) — a genuine sharded-XLA baseline,
    # never t_base = t_ours (which would fabricate vs_baseline = 1.0).
    shape = tuple(int(x) for x in N)
    t_base = None
    if not os.environ.get("BENCH_SKIP_BASELINE"):
        try:
            base = lambda v: jnp.fft.irfftn(jnp.fft.rfftn(v), s=shape)
            if ndev > 1:
                out_sh = FFT.real_sharding()
                base_s = lambda v: jax.lax.with_sharding_constraint(
                    jnp.fft.irfftn(jnp.fft.rfftn(v), s=shape), out_sh)
                t_base = _timeit(base_s, u)
            else:
                t_base = _timeit(base, u)
        except Exception as e:  # XLA fft OOMs at 1024^3 where our path fits
            print(f"# baseline XLA fft failed ({type(e).__name__}); "
                  f"reporting vs_baseline=0 (baseline unavailable)", file=sys.stderr)

    print(json.dumps({
        "metric": f"3d_r2c_c2r_roundtrip_{n}cubed",
        "value": round(t_ours * 1e3, 3),
        "unit": "ms",
        "vs_baseline": 0.0 if t_base is None else round(t_base / t_ours, 3),
    }))


if __name__ == "__main__":
    main()
