"""Pallas FFT kernel tuning sweep on the real chip.

Variants raced at 256³ r2c+c2r:
  A. XLA jnp.fft (baseline)
  B. Pallas dense-DFT kernels, HIGHEST matmul precision (current default)
  C. Pallas dense-DFT kernels, HIGH (bf16x3) precision
  D. Pallas four-step in-kernel (128·2 factorization), both precisions

Also reports accuracy of each variant vs numpy on the host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, x, iters=10):
    chain = jax.jit(lambda v: jnp.sum(
        lax.scan(lambda c, _: (fn(c), None), v, None, length=iters)[0]))
    float(chain(x))
    t0 = time.perf_counter()
    float(chain(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from mpifft4py_tpu.ops import pallas_fft as pf

    N = int(os.environ.get("BENCH_N", "256"))
    u_np = np.random.default_rng(0).standard_normal((N, N, N)).astype(np.float32)
    u = jax.device_put(u_np)
    ref = np.fft.rfftn(u_np.astype(np.float64))
    refmax = np.abs(ref).max()

    def fwd(v):
        x = pf.rfft_last(v)
        x = pf.fft_axis(x, axis=1)
        return pf.fft_axis(x, axis=0)

    def bwd(f):
        x = pf.fft_axis(f, axis=0, inverse=True)
        x = pf.fft_axis(x, axis=1, inverse=True)
        return pf.irfft_last(x, N)

    def rt(v):
        return bwd(fwd(v))

    # NOTE: Mosaic supports only DEFAULT and HIGHEST dot precisions.
    for prec_name, prec in [("HIGHEST", lax.Precision.HIGHEST),
                            ("DEFAULT", lax.Precision.DEFAULT)]:
        pf._PREC = prec
        for k in (pf._dft_cs, pf._rdft_cs):
            k.cache_clear()
        err_rt = float(jax.jit(lambda v: jnp.max(jnp.abs(rt(v) - v)))(u))
        # forward accuracy vs f64 numpy (gather re/im separately; axon-safe)
        fr = jax.jit(lambda v: (jnp.real(fwd(v)), jnp.imag(fwd(v))))(u)
        out = np.asarray(fr[0], np.float64) + 1j * np.asarray(fr[1], np.float64)
        err_f = np.abs(out - ref).max() / refmax
        t = timeit(rt, u)
        print(f"pallas {prec_name:8s}: roundtrip {t:7.3f} ms   "
              f"rt-err {err_rt:.2e}   fwd-rel-err {err_f:.2e}", flush=True)

    t_xla = timeit(lambda v: jnp.fft.irfftn(jnp.fft.rfftn(v), s=(N, N, N)), u)
    print(f"XLA fft          : roundtrip {t_xla:7.3f} ms")


if __name__ == "__main__":
    main()
