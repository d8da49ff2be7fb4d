"""API-boundary composition A/B: does the zdif unpermute fuse into the
pack/unpack concat?  (round 5, VERDICT r4 item 3)

Standalone costs at 1024³ (lane_interleave_onchip.py): take pair 44.8 ms
fwd + 45.3 bwd vs 18.1 elementwise — the permutation pair is the
dominant term of the 141 ms API-vs-packed gap.  But the permutation is a
pure layout op: if XLA fuses it into the boundary's concat (each output
lane reads exactly one input lane), the composed boundary should cost no
more than the unpermuted boundary.  Cases (each a pair→complex→pair
roundtrip, fixed carry shape):

  plain      unpack(pair) … pack          — boundary floor, no permutation
  take       unpack(take_iperm) … take_perm(pack)
  interleave unpack(dif_interleave) … dif_deinterleave(pack)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/api_boundary_onchip.py [N ...]
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
    import jax.numpy as jnp
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.ops.pallas_zdif import (dif_deinterleave,
                                               dif_interleave, zdif_iperm,
                                               zdif_perm)
    from mpifft4py_tpu.utils.profiling import measure

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [768, 1024]
    rng = np.random.default_rng(9)
    for n in sizes:
        h = n // 2
        iters = 10 if n <= 768 else 8
        xr = jnp.asarray(rng.standard_normal((n, n, h)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((n, n, h)).astype(np.float32))
        ip = jnp.asarray(zdif_iperm(n))
        pm = jnp.asarray(zdif_perm(n))

        def plain(p):
            fu = p3.unpack_spectrum(p[0], p[1])
            return p3.pack_spectrum(fu)

        def take(p):
            fu = p3.unpack_spectrum(jnp.take(p[0], ip, axis=-1),
                                    jnp.take(p[1], ip, axis=-1))
            br, bi = p3.pack_spectrum(fu)
            return jnp.take(br, pm, axis=-1), jnp.take(bi, pm, axis=-1)

        def interleave(p):
            fu = p3.unpack_spectrum(dif_interleave(p[0], n),
                                    dif_interleave(p[1], n))
            br, bi = p3.pack_spectrum(fu)
            return dif_deinterleave(br, n), dif_deinterleave(bi, n)

        for name, fn in (("plain", plain), ("take", take),
                         ("interleave", interleave)):
            ms = measure(fn, (xr, xi), iters=iters) * 1e3
            print(json.dumps({"n": n, "case": name, "ms": round(ms, 3)}),
                  flush=True)
        del xr, xi


if __name__ == "__main__":
    main()
