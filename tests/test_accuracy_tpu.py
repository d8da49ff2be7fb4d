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


@tpu_only
def test_rdma_kernels_lower_on_hardware():
    """The RDMA megakernels must LOWER through Mosaic on real TPU (interpret
    mode cannot prove lowering — jnp.flip's `rev`, for example, interprets
    fine but has no TC lowering).  P=1 self-RDMA exercises the full DMA/
    semaphore/matmul choreography on one chip; the fused forward is matmul-
    identical to fft_axis_planar (bitwise on hardware, measured 0.0)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from mpifft4py_tpu.parallel.rdma import (fused_transpose_fft_x,
                                             fused_ifft_x_transpose)
    from mpifft4py_tpu.ops import pallas_fft3d as p3

    mesh = Mesh(np.array(jax.devices()[:1]), ("p",))
    rng = np.random.default_rng(0)
    yr = jnp.asarray(rng.standard_normal((16, 16, 128)).astype(np.float32))
    yi = jnp.asarray(rng.standard_normal((16, 16, 128)).astype(np.float32))
    f = jax.jit(jax.shard_map(
        lambda a, b: fused_transpose_fft_x(a, b, "p", 1), mesh=mesh,
        in_specs=(P(), P()), out_specs=(P(), P()), check_vma=False))
    got = f(yr, yi)
    ref = jax.jit(lambda a, b: p3.fft_axis_planar(a, b, axis=0))(yr, yi)
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r).max()) < 1e-5
    g2 = jax.jit(jax.shard_map(
        lambda a, b: fused_ifft_x_transpose(a, b, "p", 1), mesh=mesh,
        in_specs=(P(), P()), out_specs=(P(), P()), check_vma=False))(*got)
    for g, x0 in zip(g2, (yr, yi)):
        assert float(jnp.abs(g - x0).max()) < 1e-5


@tpu_only
def test_factored_combine_lowers_at_r4_class():
    """The factored DIT's cross-block combine must LOWER through Mosaic on
    hardware at r >= 4 (512-class n).  Radix-2 (256-class) has no w() call
    in _block_dft, so 256-class on-chip tests CANNOT catch a combine-scalar
    lowering break: the round-3 (1,1)-table-slice form compiled and ran at
    256-class but failed every 512/768/1024-class program with Mosaic
    "Broadcast in both sublanes and lanes" (BENCH.md round-3 session 4).
    This covers both combine signs (fwd/bwd) at n=512 (r=4, m=128)."""
    import jax.numpy as jnp
    from mpifft4py_tpu.ops import pallas_fft3d as p3

    rng = np.random.default_rng(2)
    # c2c planar axis FFT, both directions (sign -1/+1), r=4
    xr = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    fr, fi = jax.jit(lambda a, b: p3.fft_axis_planar(a, b, axis=0))(xr, xi)
    ref = np.fft.fft(np.asarray(xr) + 1j * np.asarray(xi), axis=0)
    scale = np.abs(ref).max()
    assert np.abs((np.asarray(fr) + 1j * np.asarray(fi)) - ref).max() / scale < 1e-5
    br, bi = jax.jit(lambda a, b: p3.fft_axis_planar(a, b, axis=0,
                                                     inverse=True))(fr, fi)
    assert float(jnp.abs(br - xr).max()) < 1e-4
    assert float(jnp.abs(bi - xi).max()) < 1e-4

    # fused z+y kernels (fwd -1 / bwd +1) at 512-class planes
    u = jnp.asarray(rng.standard_normal((1, 512, 512)).astype(np.float32))
    zr, zi = jax.jit(p3.fused_zy_fwd)(u)
    back = jax.jit(lambda a, b: p3.fused_zy_bwd(a, b, 512))(zr, zi)
    assert float(jnp.abs(back - u).max()) < 1e-4
