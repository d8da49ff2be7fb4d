"""TPU-gated accuracy assertions in the driver's units (max RELATIVE error).

BASELINE targets: <1e-6 round-trip relative (fp32), <1e-12 (emulated fp64).
The CPU test mesh (tests/conftest.py) forces the cpu backend, so these skip
there; run them on hardware with:

    PYTHONPATH=/root/.axon_site:/root/repo python -m pytest \
        tests/test_accuracy_tpu.py -q -p no:cacheprovider --noconftest

Recorded results: benchmarks/results/accuracy_tpu.json (BENCH.md table).
"""

import numpy as np
import pytest

import jax

TAU = 2 * np.pi

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="accuracy targets are TPU-hardware claims")


@tpu_only
def test_fp32_relative_targets():
    from mpifft4py_tpu.slab import R2C
    N = 64
    FFT = R2C(np.array([N] * 3), np.array([TAU] * 3), 1, "single")
    u = np.random.default_rng(0).standard_normal((N,) * 3).astype(np.float32)
    ref = np.fft.rfftn(u.astype(np.float64))
    fu = FFT.gather(FFT.fftn(u))
    assert np.abs(fu - ref).max() / np.abs(ref).max() < 1e-6
    ub = FFT.gather(FFT.ifftn(FFT.fftn(u)))
    assert np.abs(ub - u).max() / np.abs(u).max() < 1e-6


@tpu_only
def test_doubleword_relative_targets():
    from mpifft4py_tpu.slab import R2C
    N = 64
    FFT = R2C(np.array([N] * 3), np.array([TAU] * 3), 1, "double")
    assert FFT.policy.path == "doubleword"
    u = np.random.default_rng(1).standard_normal((N,) * 3)
    ref = np.fft.rfftn(u)
    fu = FFT.fftn(u)
    assert np.abs(FFT.gather_dd(fu) - ref).max() / np.abs(ref).max() < 1e-12
    ub = FFT.gather_dd(FFT.ifftn(fu))
    assert np.abs(ub - u).max() / np.abs(u).max() < 1e-12
