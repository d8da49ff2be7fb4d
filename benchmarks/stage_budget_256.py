"""256³ stage-budget audit (VERDICT r3 item 2): per-stage device ms of the
driver's primary metric, the API r2c+c2r round trip at 256³ (~3.4 ms total).

Pipeline (serial fast path, P==1, plain):
    fwd:  fused_zy_fwd (z+y, one kernel) -> fft_axis_planar(axis 0) -> unpack
    bwd:  pack -> fft_axis_planar(axis 0, inv) -> fused_zy_bwd

The relay only times shape-preserving chains (utils.profiling.measure), so
each stage is measured as its round-trip pair and cross-checked against the
full-path numbers:  API_rt ~= zy_rt + x_rt + boundary_rt.

Also prints the bandwidth/M XU floor anchors: an x+1 elementwise pass over
the packed pair (the measured HBM streaming rate) and the stock XLA round
trip.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/stage_budget_256.py [N]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    from mpifft4py_tpu.utils.profiling import measure

    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    h = N // 2
    iters = 50 if N <= 256 else 20

    rows = {}

    def rec(name, fn, x, gb_moved=None):
        t = measure(fn, x, iters=iters) * 1e3
        rows[name] = round(t, 3)
        extra = ""
        if gb_moved is not None:
            extra = f"  ({gb_moved / (t * 1e-3) :.0f} GB/s)"
        print(f"{name:28s} {t:8.3f} ms{extra}", flush=True)
        return t

    # full paths ------------------------------------------------------------
    FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                   "single")
    fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
    rec("API roundtrip", lambda v: bwd(fwd(v)), u)
    rec("packed roundtrip", lambda v: p3.irfft3d_packed(
        *p3.rfft3d_packed(v), (N, N, N)), u)

    # stage pairs -----------------------------------------------------------
    rec("zy fwd+bwd", lambda v: p3.fused_zy_bwd(*p3.fused_zy_fwd(v), N), u)

    yr, yi = jax.jit(p3.fused_zy_fwd)(u)
    pair_gb = 2 * N * N * h * 4 / 1e9

    def xrt(p):
        ar, ai = p3.fft_axis_planar(p[0], p[1], axis=0)
        return p3.fft_axis_planar(ar, ai, axis=0, inverse=True)

    rec("x fwd+inv (pair)", xrt, (yr, yi))

    def boundary(p):
        return p3.pack_spectrum(p3.unpack_spectrum(p[0], p[1]))

    rec("boundary unpack+pack", boundary, (yr, yi), gb_moved=4 * pair_gb)

    # anchors ---------------------------------------------------------------
    rec("elementwise x+1 (pair)", lambda p: (p[0] + 1.0, p[1] + 1.0),
        (yr, yi), gb_moved=2 * pair_gb)
    try:
        shape = (N, N, N)
        rec("stock XLA roundtrip",
            lambda v: jnp.fft.irfftn(jnp.fft.rfftn(v), s=shape), u)
    except Exception as e:
        print(f"stock XLA failed: {type(e).__name__}")

    resid = rows["API roundtrip"] - (rows["zy fwd+bwd"]
                                     + rows["x fwd+inv (pair)"]
                                     + rows["boundary unpack+pack"])
    rows["residual (API - sum)"] = round(resid, 3)
    print(json.dumps({"N": N, "iters": iters, "stages_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
