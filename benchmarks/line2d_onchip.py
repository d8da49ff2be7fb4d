"""2D (line.R2C) round-trip tier A/B on chip: Pallas serial-2D vs XLA fft.

The NS2D consumer A/B (BENCH.md round 4) found the complex layout 1.7x
SLOWER with the Pallas 2D tier at 1024^2 (27.0 vs 16.0 ms/step) while the
512^2 driver config had the tier winning its round trip (2.56 vs 2.81 ms).
This isolates the transform: one fftn+ifftn round trip per tier per size,
relay-safe scan timing (utils.profiling.measure, iters=50).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/line2d_onchip.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    import jax
    from mpifft4py_tpu import line
    from mpifft4py_tpu.utils.profiling import measure

    rows = []
    for N in (512, 1024, 2048):
        FFT = line.R2C(np.array([N, N]), np.array([2 * np.pi] * 2), None,
                       "single")
        fwd = FFT.forward_fn()
        bwd = FFT.backward_fn()
        u = jax.device_put(np.random.default_rng(0)
                           .standard_normal((N, N)).astype(np.float32))
        for tier, env in (("pallas", "1"), ("xla", "0")):
            # NOTE (ADVICE r4 item 3): toggling the env var after fwd/bwd are
            # built only works because utils.profiling.measure jits a FRESH
            # closure per call, so _pallas2d_ok is re-read at trace time.  If
            # measure ever caches traced programs, rebuild fwd/bwd (or the
            # FFT object) inside this loop instead.
            os.environ["MPIFFT4PY_TPU_PALLAS2D"] = env
            if tier == "pallas" and not FFT._pallas2d_ok(None):
                rows.append({"N": N, "tier": tier, "skip": "gate off"})
                print(json.dumps(rows[-1]), flush=True)
                continue
            ms = measure(lambda v: bwd(fwd(v)), u, iters=50) * 1e3
            rows.append({"N": N, "tier": tier, "roundtrip_ms": round(ms, 3)})
            print(json.dumps(rows[-1]), flush=True)
        del FFT, fwd, bwd, u
    os.environ.pop("MPIFFT4PY_TPU_PALLAS2D", None)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
