"""On-chip validation + A/B of the DIF z-order packed pipeline (round 3).

Hardware-parity first (interpret mode cannot catch Mosaic lowering gaps —
BENCH.md round-3 session 4), then the packed-interface round-trip timing.
The DIF/dense choice rides MPIFFT4PY_TPU_ZDIF (auto = DIF where gated), so
A/B runs are two invocations of this script.

Usage: [MPIFFT4PY_TPU_ZDIF=0] PYTHONPATH=/root/.axon_site:/root/repo \
           python benchmarks/zdif_pipeline_onchip.py [N ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 768, 1024]
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.ops import pallas_zdif as z
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    from mpifft4py_tpu.utils.profiling import measure

    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))

    rng = np.random.default_rng(5)
    for N in sizes:
        t0 = time.perf_counter()
        FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                       "single")
        dif = FFT.packed_z_perm is not None
        fwd = jax.jit(FFT.forward_packed_fn("2/3-rule"))
        bwd = jax.jit(FFT.backward_packed_fn("2/3-rule"))

        # hardware parity on a thin x-slab: forward spectrum vs numpy
        # (permuted when dif), then the masked round trip vs itself.
        # MPIFFT4PY_ZDIF_SKIP_PARITY=1 skips the (single-core-numpy-
        # expensive) oracle for timing-only re-runs of already-validated
        # configurations.
        skip_parity = os.environ.get("MPIFFT4PY_ZDIF_SKIP_PARITY") == "1"
        ferr = rerr = float("nan")
        if not skip_parity:
            u = rng.standard_normal((N, N, N)).astype(np.float32)
            print(f"N={N} dif={dif}: compiling fwd…", flush=True)
            yr, yi = fwd(jnp.asarray(u))
            got_r = np.asarray(yr[:2])
            got_i = np.asarray(yi[:2])
            print(f"  fwd done ({time.perf_counter()-t0:.0f}s)", flush=True)
            h = N // 2
            ref = np.fft.rfftn(u.astype(np.float64), axes=(0, 1, 2))[:2, :, :h]
            cut = 2.0 / 3.0 * (N // 2)
            k = np.fft.fftfreq(N, 1.0 / N)
            mask = ((np.abs(k)[:2, None, None] < cut)
                    & (np.abs(k)[None, :, None] < cut)
                    & (np.arange(h)[None, None, :] < cut))
            want = np.where(mask, ref, 0)
            if dif:
                want = want[..., z.zdif_perm(N)]
            ferr = max(np.abs(got_r - want.real).max(),
                       np.abs(got_i - want.imag).max()) / np.abs(ref).max()
            print(f"  fwd_rel={ferr:.2e}; compiling bwd…", flush=True)
            ub = np.asarray(bwd((yr, yi))[:2])
            full = np.fft.rfftn(u.astype(np.float64), axes=(0, 1, 2))
            fm = ((np.abs(k)[:, None, None] < cut)
                  & (np.abs(k)[None, :, None] < cut)
                  & (np.arange(N // 2 + 1)[None, None, :] < cut))
            uref = np.fft.irfftn(np.where(fm, full, 0), s=(N, N, N))[:2]
            rerr = np.abs(ub - uref).max() / max(np.abs(uref).max(), 1e-30)
            del u, yr, yi

        # timed masked round trip (one scan chain + scalar fetch)
        v = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
        iters = 20 if N <= 512 else 5
        t = measure(lambda x: bwd(fwd(x)), v, iters=iters)
        print(json.dumps({"N": N, "zdif": dif,
                          "fwd_rel": float(ferr), "rt_rel": float(rerr),
                          "masked_roundtrip_ms": round(t * 1e3, 2),
                          "wall_s": round(time.perf_counter() - t0, 0)}),
              flush=True)
        del FFT, fwd, bwd, v


if __name__ == "__main__":
    main()
