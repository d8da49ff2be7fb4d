"""Post-zdif stage-budget audit at the frontier sizes (VERDICT r4 item 2).

The 1024³ budget in BENCH.md's round-2 section ("z dense 145 of 364 ms")
describes a pipeline that no longer exists at the round-4 163.41 ms packed
round trip; this reproduces the 256³ audit's rigor for 768/1024: per-stage
round-trip ms for the zdif z-stage, the factored y and x planar stages, and
the complex API boundary, with bandwidth anchors alongside.

Pipeline at these sizes (fused-zy gate fails above 512-class, so stages are
separate kernels):
    fwd: rfft_last_zdif -> fft_axis_planar(y) -> fft_axis_planar(x)
    bwd: fft_axis_planar(x, inv) -> fft_axis_planar(y, inv) -> irfft_last_zdif

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/stage_budget_big.py [N ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def run(N, iters):
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.ops import pallas_zdif as zd
    from mpifft4py_tpu.utils.profiling import measure

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    h = N // 2
    rows = {}

    def rec(name, fn, x, gb_moved=None):
        t = measure(fn, x, iters=iters) * 1e3
        rows[name] = round(t, 3)
        extra = ""
        if gb_moved is not None:
            extra = f"  ({gb_moved / (t * 1e-3):.0f} GB/s)"
        print(f"{N}  {name:28s} {t:8.3f} ms{extra}", flush=True)
        return t

    FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                   "single")
    fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
    rec("API roundtrip", lambda v: bwd(fwd(v)), u)
    rec("packed+zdif roundtrip", lambda v: p3.irfft3d_packed(
        *p3.rfft3d_packed(v, dif=True), (N, N, N), dif=True), u)

    # stage pairs -----------------------------------------------------------
    rec("z zdif fwd+bwd", lambda v: zd.irfft_last_zdif(
        *zd.rfft_last_zdif(v), N), u)
    yr, yi = jax.jit(zd.rfft_last_zdif)(u)
    yr.block_until_ready()
    del u      # at 1024³ the real cube (4 GiB) + two live pairs OOM the chip
    pair_gb = 2 * N * N * h * 4 / 1e9

    def yrt(p):
        ar, ai = p3.fft_axis_planar(p[0], p[1], axis=1)
        return p3.fft_axis_planar(ar, ai, axis=1, inverse=True)

    def xrt(p):
        ar, ai = p3.fft_axis_planar(p[0], p[1], axis=0)
        return p3.fft_axis_planar(ar, ai, axis=0, inverse=True)

    rec("y fwd+inv (pair)", yrt, (yr, yi), gb_moved=4 * pair_gb)
    rec("x fwd+inv (pair)", xrt, (yr, yi), gb_moved=4 * pair_gb)

    def boundary(p):
        return p3.pack_spectrum(p3.unpack_spectrum(p[0], p[1]))

    rec("boundary unpack+pack", boundary, (yr, yi), gb_moved=4 * pair_gb)
    rec("elementwise x+1 (pair)", lambda p: (p[0] + 1.0, p[1] + 1.0),
        (yr, yi), gb_moved=2 * pair_gb)

    resid = rows["packed+zdif roundtrip"] - (rows["z zdif fwd+bwd"]
                                             + rows["y fwd+inv (pair)"]
                                             + rows["x fwd+inv (pair)"])
    rows["residual (packed - sum)"] = round(resid, 3)
    print(json.dumps({"N": N, "iters": iters, "stages_ms": rows}), flush=True)


def main():
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [768, 1024]
    for N in sizes:
        run(N, iters=20)


if __name__ == "__main__":
    main()
