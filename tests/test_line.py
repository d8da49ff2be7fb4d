"""Line R2C (2D, 1D decomposition) vs numpy oracles — driver eval config 2."""

import numpy as np
import pytest

from mpifft4py_tpu import line

TAU = 2 * np.pi


def make(N0, N1, P, precision="double", **kw):
    return line.R2C(np.array([N0, N1]), np.array([TAU, TAU]), P, precision, **kw)


@pytest.mark.parametrize("P", [1, 2, 4, 8])
@pytest.mark.parametrize("precision", ["single", "double"])
def test_fft2_vs_numpy(rng, P, precision):
    N = 32
    FFT = make(N, N, P, precision)
    u = rng.standard_normal((N, N)).astype(FFT.float)
    fu = np.asarray(FFT.fft2(FFT.shard_real(u)))
    ref = np.fft.rfft2(u.astype(np.float64))
    rtol = 1e-6 if precision == "single" else 1e-12
    # result is alignment-padded along the rfft axis: valid modes, then zeros
    assert fu.shape == FFT.global_complex_shape()
    assert np.abs(fu[:, :FFT.Nf] - ref).max() / np.abs(ref).max() < rtol
    assert np.all(fu[:, FFT.Nf:] == 0)
    ub = FFT.ifft2(FFT.shard_complex(fu))
    assert np.abs(np.asarray(ub) - u).max() / np.abs(u).max() < rtol


def test_config2_512sq(rng):
    """Driver eval config 2: line R2C 512², 1D slab decomposition."""
    N = 512
    FFT = make(N, N, 8)
    u = rng.standard_normal((N, N))
    fu = np.asarray(FFT.fft2(u))
    ref = np.fft.rfft2(u)
    assert np.abs(fu[:, :FFT.Nf] - ref).max() / np.abs(ref).max() < 1e-12
    ub = np.asarray(FFT.ifft2(FFT.shard_complex(fu)))
    assert np.abs(ub - u).max() < 1e-12


@pytest.mark.parametrize("P", [1, 4])
def test_line_nf_not_divisible(rng, P):
    """Nf = N1//2+1 = 17 is odd — alignment padding must make P=4 work."""
    FFT = make(16, 32, P)
    assert FFT.Nf == 17
    assert FFT.Nfp % P == 0
    u = rng.standard_normal((16, 32))
    fu = np.asarray(FFT.fft2(u))
    assert np.allclose(fu[:, :17], np.fft.rfft2(u), atol=1e-10)
    ub = np.asarray(FFT.ifft2(FFT.shard_complex(fu)))
    assert np.allclose(ub, u, atol=1e-12)


@pytest.mark.parametrize("P", [1, 2, 4])
def test_line_padded_roundtrip(rng, P):
    N = 16
    FFT = make(N, N, P)
    u = rng.standard_normal((N, N))
    fu = np.asarray(FFT.fft2(u))
    up = FFT.ifft2(FFT.shard_complex(fu), dealias="3/2-rule")
    assert up.shape == FFT.global_real_shape_padded()
    fu2 = np.asarray(FFT.fft2(up, dealias="3/2-rule"))
    assert np.allclose(fu2, fu, atol=1e-10 * N * N)


def test_line_padded_physical(rng):
    N = 16
    FFT = make(N, N, 2)
    x = np.arange(N) * TAU / N
    X = np.meshgrid(x, x, indexing="ij")
    u = np.cos(3 * X[0]) * np.sin(5 * X[1])
    up = np.asarray(FFT.ifft2(FFT.fft2(u), dealias="3/2-rule"))
    M = 3 * N // 2
    xm = np.arange(M) * TAU / M
    Xm = np.meshgrid(xm, xm, indexing="ij")
    um = np.cos(3 * Xm[0]) * np.sin(5 * Xm[1])
    assert np.abs(up - um).max() < 1e-10


def test_line_dealias_and_mesh(rng):
    N = 32
    FFT = make(N, N, 4)
    filt = np.asarray(FFT.get_dealias_filter())
    cut = 2 / 3 * (N // 2)
    k0 = np.fft.fftfreq(N, 1 / N)
    k1 = np.arange(FFT.Nfp)
    ref = (np.abs(k0)[:, None] < cut) & (k1[None, :] < cut)
    assert np.array_equal(filt.astype(bool), ref)
    K = np.asarray(FFT.get_local_wavenumbermesh())
    assert np.array_equal(K[0][:, 0], k0)
    X = np.asarray(FFT.get_local_mesh())
    assert np.allclose(X[1][0, :], np.arange(N) * TAU / N)
