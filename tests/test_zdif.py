"""DIF-split packed z-stage (ops/pallas_zdif) vs numpy oracles.

Kernel execution is interpret-mode on the CPU backend; hardware lowering is
validated separately on chip (benchmarks/zdif_onchip.py — interpret parity
cannot catch Mosaic lowering gaps, see BENCH.md round-3 session 4)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mpifft4py_tpu.ops import pallas_zdif as z

@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _packed_ref(x, n):
    """numpy rfft in zdif lane order with the plane-0 rider."""
    h = n // 2
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    refp = ref[..., z.zdif_perm(n)].copy()
    refp[..., 0] = ref[..., 0].real + 1j * ref[..., h].real
    return refp


def test_gate():
    assert not z.zdif_ok(256)        # r=2 ties the dense matmuls
    assert not z.zdif_ok(384)        # r=3 odd: h % 128 != 0 anyway
    assert z.zdif_ok(512) and z.zdif_ok(768) and z.zdif_ok(1024)
    assert not z.zdif_ok(1536)       # r=12 beyond the butterfly budget


def test_perm_is_permutation():
    for n in (512, 768, 1024):
        p = z.zdif_perm(n)
        assert sorted(p) == list(range(n // 2))
        assert p[0] == 0
        assert np.all(p[z.zdif_iperm(n)] == np.arange(n // 2))


@pytest.mark.parametrize("n", [512, 768, 1024])
def test_fwd_kernel_vs_numpy(rng, n):
    R = 256
    x = rng.standard_normal((R, n)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        Zr, Zi = z.rfft_last_zdif(jnp.asarray(x))
    refp = _packed_ref(x, n)
    scale = np.abs(refp).max()
    np.testing.assert_allclose(np.asarray(Zr), refp.real, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(Zi), refp.imag, atol=2e-6 * scale)


@pytest.mark.parametrize("n", [512, 768, 1024])
def test_roundtrip(rng, n):
    R = 256
    x = rng.standard_normal((R, n)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        Zr, Zi = z.rfft_last_zdif(jnp.asarray(x))
        xb = z.irfft_last_zdif(Zr, Zi, n)
    np.testing.assert_allclose(np.asarray(xb), x, atol=2e-6 * np.abs(x).max())


@pytest.mark.parametrize("n", [512, 768])
def test_bwd_matches_dense_inverse_on_permuted_input(rng, n):
    """irfft_last_zdif(Z_perm) == irfft_last_packed(Z natural) for the same
    spectrum — the two inverses agree through the lane permutation."""
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    R = 128
    x = rng.standard_normal((R, n)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        Yr, Yi = p3.rfft_last_packed(jnp.asarray(x))      # natural order
        pm = z.zdif_perm(n)                               # lane l -> k
        xb = z.irfft_last_zdif(Yr[:, pm], Yi[:, pm], n)   # natural -> DIF order
        xa = p3.irfft_last_packed(Yr, Yi, n)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                               atol=2e-6 * np.abs(x).max())


def test_multidim_batch(rng):
    n = 512
    x = rng.standard_normal((2, 4, 32, n)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        Zr, Zi = z.rfft_last_zdif(jnp.asarray(x))
        xb = z.irfft_last_zdif(Zr, Zi, n)
    assert Zr.shape == (2, 4, 32, n // 2)
    refp = _packed_ref(x, n)
    scale = np.abs(refp).max()
    np.testing.assert_allclose(np.asarray(Zr), refp.real, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(xb), x, atol=2e-6 * np.abs(x).max())


@pytest.mark.parametrize("n", [512, 768, 1024])
def test_interleave_matches_take(rng, n):
    """dif_interleave/deinterleave (slices + stack/concat + reshape — the
    structured form of the zdif lane permutation, round 5) are bitwise equal
    to the jnp.take gathers they replace."""
    h = n // 2
    x = jnp.asarray(rng.standard_normal((3, 5, h)).astype(np.float32))
    ip, pm = z.zdif_iperm(n), z.zdif_perm(n)
    assert np.array_equal(np.asarray(z.dif_interleave(x, n)),
                          np.asarray(x)[..., ip])
    assert np.array_equal(np.asarray(z.dif_deinterleave(x, n)),
                          np.asarray(x)[..., pm])
    # inverse pair
    assert np.array_equal(
        np.asarray(z.dif_deinterleave(z.dif_interleave(x, n), n)),
        np.asarray(x))


@pytest.mark.parametrize("n2", [768, 1024])
def test_api_boundary_unperm_vs_numpy(rng, n2, monkeypatch):
    """rfft3d/irfft3d with the API-zdif boundary (radix-dependent unpermute:
    dif_interleave at r=6, take at r=8) against numpy, small leading axes."""
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    monkeypatch.setenv("MPIFFT4PY_TPU_API_ZDIF", "1")
    assert p3._api_zdif(n2)
    x = rng.standard_normal((8, 8, n2)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        fu = np.asarray(p3.rfft3d(jnp.asarray(x)))
        back = np.asarray(p3.irfft3d(jnp.asarray(fu), (8, 8, n2)))
    ref = np.fft.rfftn(x.astype(np.float64))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(fu, ref, atol=4e-6 * scale)
    np.testing.assert_allclose(back, x, atol=4e-5)
