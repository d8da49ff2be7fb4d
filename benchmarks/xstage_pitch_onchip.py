"""x-stage row-pitch de-aliasing experiment (round 5).

The tq sweep refuted the chunk-size hypothesis (128→384 lanes: only 5%),
so the remaining suspect for the x stage's 205–218 GB/s is the ROW PITCH:
axis-0 blocks step between sublane rows at N1·h·4 bytes — exactly 2 MiB
at 1024³ and 1.125 MiB at 768³ — so every row in a block lands on the
same DRAM bank set.  This probes a lane-padded layout (N0, N1, h+pad):
the x-stage grid walks (j1, j2) over N1 × (h/tq) lane blocks with block
index j1·(hp/tq)+j2, skipping the pad lanes entirely (no wasted traffic),
while the pitch becomes N1·(h+pad)·4 — bank-decorrelated.  Each case is a
fwd+inv ROUNDTRIP in a fixed layout pair (A→B fwd, B→A inv) so the scan
carry keeps one shape; compare to the library's "x fwd+inv" stage-budget
rows (33.2 ms @768, 83.6 @1024).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/xstage_pitch_onchip.py [N ...]
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

PAD = 128


def main():
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.utils.profiling import measure

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [768, 1024]
    rng = np.random.default_rng(3)

    def x_pass(n, N1, h_in, h_out, tq, inverse):
        """axis-0 planar c2c, live lanes = first min(h_in, h_out) of each
        h_in/h_out lane group; pad lanes skipped by the block index maps."""
        h = min(h_in, h_out)
        assert h % tq == 0 and h_in % tq == 0 and h_out % tq == 0
        r, m = p3._factor(n, tuned=True)
        sign = +1 if inverse else -1
        wr, wi = p3._dft_cs(m, sign, scale=(1.0 / n) if inverse else 1.0)
        cr, ci = p3._combine_cs(n, r, m, sign)
        grid = (N1, h // tq)

        def imap(hh):
            return lambda j1, j2: (0, 0, j1 * (hh // tq) + j2)

        in_spec = pl.BlockSpec((1, n, tq), imap(h_in), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, n, tq), imap(h_out),
                                memory_space=pltpu.VMEM)
        bspec_w = pl.BlockSpec((m, m), lambda j1, j2: (0, 0),
                               memory_space=pltpu.VMEM)
        bspec_c = pl.BlockSpec((r * r * m, 1), lambda j1, j2: (0, 0),
                               memory_space=pltpu.VMEM)
        kernel = partial(p3._factored_fft_kernel, n, r, m, sign)
        fn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_spec, in_spec, bspec_w, bspec_w, bspec_c, bspec_c],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((1, n, N1 * h_out), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=2 * 3 * m * m * r * N1 * h,
                bytes_accessed=4 * n * N1 * h * 4, transcendentals=0),
        )

        def f(xr, xi):
            yr, yi = fn(xr.reshape(1, n, N1 * h_in),
                        xi.reshape(1, n, N1 * h_in),
                        jnp.asarray(wr), jnp.asarray(wi),
                        jnp.asarray(cr), jnp.asarray(ci))
            return (yr.reshape(n, N1, h_out), yi.reshape(n, N1, h_out))
        return f

    for N in sizes:
        h = N // 2
        hp = h + PAD
        tq = 128
        iters = 20 if N <= 768 else 10
        xr = jnp.asarray(rng.standard_normal((N, N, h)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((N, N, h)).astype(np.float32))
        padw = [(0, 0), (0, 0), (0, PAD)]
        gb = 4 * 2 * N * N * h * 4 / 1e9      # pair r+w, fwd+inv

        def rt(h_a, h_b):
            fwd = x_pass(N, N, h_a, h_b, tq, inverse=False)
            inv = x_pass(N, N, h_b, h_a, tq, inverse=True)
            return lambda p: inv(*fwd(*p))

        cases = {
            "compact<->compact": (rt(h, h), (xr, xi)),
            "compact<->padded": (rt(h, hp), (xr, xi)),
            "padded<->compact": (rt(hp, h), (jnp.pad(xr, padw),
                                             jnp.pad(xi, padw))),
            "padded<->padded": (rt(hp, hp), (jnp.pad(xr, padw),
                                             jnp.pad(xi, padw))),
        }
        for name, (f, args) in cases.items():
            err = float(jnp.max(jnp.abs(
                jax.jit(f)(args)[0][:, :, :h] - xr)))
            ms = measure(f, args, iters=iters) * 1e3
            print(json.dumps({"N": N, "case": name, "ms": round(ms, 3),
                              "GBps": round(gb / (ms * 1e-3), 1),
                              "rt_err": round(err, 9)}), flush=True)
        del xr, xi

if __name__ == "__main__":
    main()
