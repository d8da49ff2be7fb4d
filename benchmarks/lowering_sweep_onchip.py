"""On-chip Mosaic-lowering sweep for every kernel path that only the
interpreter has executed (VERDICT r3 item 4; CLAUDE.md rule: interpret-mode
parity cannot catch hardware lowering gaps — compile-check new kernel paths
on chip at r>=4 sizes).

Each case compiles AND runs the kernel on the real chip at a representative
512/768-class shape (thin leading dims keep runtime/memory small without
changing the Mosaic program class: tile picks depend on the transform sizes,
not the batch extent) and checks parity against a numpy/XLA reference.
Prints one JSON row per path: {path, ok, rel_err | error}.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/lowering_sweep_onchip.py
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _cross_np(x, y):
    return np.stack([x[1] * y[2] - x[2] * y[1],
                     x[2] * y[0] - x[0] * y[2],
                     x[0] * y[1] - x[1] * y[0]])


def _packed_z_ref(x, n, dif):
    """numpy packed z-rfft (plane-0 rider), zdif lane order when dif."""
    from mpifft4py_tpu.ops import pallas_zdif as z
    h = n // 2
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    out = ref[..., :h].copy()
    out[..., 0] = ref[..., 0].real + 1j * ref[..., h].real
    if dif and z.zdif_active(n):
        out = out[..., z.zdif_perm(n)]
    return out


def main():
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.ops import pallas_zdif as z
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache

    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    rng = np.random.default_rng(11)
    rows = []

    def case(name, fn):
        t0 = time.perf_counter()
        try:
            rel = fn()
            rows.append({"path": name, "ok": bool(rel < 1e-5),
                         "rel_err": float(rel),
                         "wall_s": round(time.perf_counter() - t0, 0)})
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            rows.append({"path": name, "ok": False, "error": msg[:400],
                         "wall_s": round(time.perf_counter() - t0, 0)})
            traceback.print_exc(limit=3)
        print(json.dumps(rows[-1]), flush=True)

    # -- wide-pencil leg: z-only fused kernels at 512-class ------------------
    n2 = 512
    shp = (3, 16, 512, n2)
    a = rng.standard_normal(shp).astype(np.float32)
    b = rng.standard_normal(shp).astype(np.float32)
    c = rng.standard_normal(shp).astype(np.float32)
    d = rng.standard_normal(shp).astype(np.float32)
    t = rng.standard_normal((1,) + shp[1:]).astype(np.float32)
    R = shp[1] * shp[2]
    print(f"cross_z_ok({n2}, {R}) =", p3.cross_z_ok(n2, R),
          " two =", p3.cross_z_ok(n2, R, two=True),
          " mul =", p3.cross_z_ok(n2, R, mul=True),
          " tr12 =", p3._crossz_pick_tr(12, n2, R), flush=True)

    def wide_cross():
        got = jax.jit(lambda x, y: p3.cross_rfft_z_packed(x, y, dif=True))(
            jnp.asarray(a), jnp.asarray(b))
        ref = _packed_z_ref(_cross_np(a, b), n2, True)
        s = np.abs(ref).max()
        return max(np.abs(np.asarray(got[0]) - ref.real).max(),
                   np.abs(np.asarray(got[1]) - ref.imag).max()) / s
    case("wide cross_rfft_z_packed 512 (dif)", wide_cross)

    def wide_mul():
        got = jax.jit(lambda x, y: p3.mul_rfft_z_packed(x, y, dif=True))(
            jnp.asarray(a), jnp.asarray(t))
        ref = _packed_z_ref(a * t, n2, True)
        s = np.abs(ref).max()
        return max(np.abs(np.asarray(got[0]) - ref.real).max(),
                   np.abs(np.asarray(got[1]) - ref.imag).max()) / s
    case("wide mul_rfft_z_packed 512 (dif)", wide_mul)

    def wide_cross2():
        got = jax.jit(lambda w, x, y, v: p3.cross_rfft_z_packed(
            w, x, y, v, dif=True))(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(c), jnp.asarray(d))
        ref = _packed_z_ref(_cross_np(a, b) + _cross_np(c, d), n2, True)
        s = np.abs(ref).max()
        return max(np.abs(np.asarray(got[0]) - ref.real).max(),
                   np.abs(np.asarray(got[1]) - ref.imag).max()) / s
    case("wide cross2_rfft_z_packed 512 (dif)", wide_cross2)

    # -- 512-class cross2 split through the acc zy kernel (MHD route) --------
    def zy_cross2_split():
        shp2 = (3, 4, 512, 512)
        aa = rng.standard_normal(shp2).astype(np.float32)
        bb = rng.standard_normal(shp2).astype(np.float32)
        cc = rng.standard_normal(shp2).astype(np.float32)
        dd = rng.standard_normal(shp2).astype(np.float32)
        assert not p3.cross2_direct_ok(512, 512)
        got = jax.jit(lambda w, x, y, v: p3.cross_rfft_zy_packed(
            w, x, y, v, dif=True))(*(jnp.asarray(q) for q in (aa, bb, cc, dd)))
        F = _cross_np(aa, bb) + _cross_np(cc, dd)
        # reference: packed z (dif order) then full y-FFT (axis 2)
        ref = _packed_z_ref(F, 512, True)
        ref = np.fft.fft(ref, axis=2)
        s = np.abs(ref).max()
        return max(np.abs(np.asarray(got[0]) - ref.real).max(),
                   np.abs(np.asarray(got[1]) - ref.imag).max()) / s
    case("cross2 SPLIT via acc zy kernel 512 (dif)", zy_cross2_split)

    # -- 576-class buoyancy-rider XLA fallback boundary ----------------------
    def buoy_576():
        N0, N1, h = 576, 4, 256
        assert p3.fft_x_epilogue_ok(N0) and not p3.fft_x_epilogue_ok(
            N0, buoy=True)
        f = (rng.standard_normal((3, N0, N1, h))
             + 1j * rng.standard_normal((3, N0, N1, h)))
        S = (rng.standard_normal((3, N0, N1, h))
             + 1j * rng.standard_normal((3, N0, N1, h)))
        T = (rng.standard_normal((1, N0, N1, h))
             + 1j * rng.standard_normal((1, N0, N1, h)))
        k0 = np.fft.fftfreq(N0, 1.0 / N0)
        k1 = np.arange(N1, dtype=np.float64)
        k2 = np.arange(h, dtype=np.float64)
        m0 = (np.abs(k0) < N0 / 3).astype(np.float64)
        m1 = np.ones(N1)
        m2 = (k2 < h / 2).astype(np.float64)
        Ri, visc = 0.7, 0.02
        F = np.fft.fft(f, axis=1)
        F *= (m0[:, None, None] * m1[None, :, None] * m2[None, None, :])
        F[2] += Ri * T[0]
        K = [k0[:, None, None], k1[None, :, None], k2[None, None, :]]
        ksq = K[0] ** 2 + K[1] ** 2 + K[2] ** 2
        inv = 1.0 / np.where(ksq == 0, 1.0, ksq)
        div = (K[0] * F[0] + K[1] * F[1] + K[2] * F[2]) * inv
        ref = np.stack([F[cq] - K[cq] * div for cq in range(3)]) \
            - visc * ksq * S
        aj = lambda x: jnp.asarray(x, jnp.float32)
        yr, yi = jax.jit(lambda *args: p3.fft_x_epilogue_packed(
            *args[:10], "project", visc, buoy=(args[10], args[11], Ri)))(
            aj(f.real), aj(f.imag), aj(S.real), aj(S.imag),
            aj(k0), aj(k1), aj(k2), aj(m0), aj(m1), aj(m2),
            aj(T.real), aj(T.imag))
        s = np.abs(ref).max()
        return max(np.abs(np.asarray(yr) - ref.real).max(),
                   np.abs(np.asarray(yi) - ref.imag).max()) / s
    case("fft_x_epilogue 576 buoy XLA-fallback", buoy_576)

    # -- curl-only fused kernel at 768-class N0 -------------------------------
    def curl_768():
        N0, N1, N2 = 768, 8, 512
        h = N2 // 2
        assert p3.curl_fused_ok(N0) and not p3.curl_fused_ok(
            N0, with_state=True)
        u = rng.standard_normal((3, N0, N1, N2)).astype(np.float32)
        fu = np.fft.rfftn(u, axes=(1, 2, 3))
        k0 = np.fft.fftfreq(N0, 1.0 / N0).astype(np.float32)
        k1 = np.fft.fftfreq(N1, 1.0 / N1).astype(np.float32)
        k2 = np.arange(h, dtype=np.float32)
        mask = ((np.abs(k0)[:, None, None] < 2 / 3 * (N0 // 2))
                & (np.abs(k1)[None, :, None] < 2 / 3 * (N1 // 2))
                & (k2[None, None, :] < 2 / 3 * h))
        # complex dtypes cannot cross host<->device on the axon relay (a
        # failed transfer poisons the runtime stream): ship the float parts
        # and build the complex array on device.
        def prep(fr, fi):
            yr, yi = p3.pack_spectrum(jax.lax.complex(fr, fi))
            qr, qi = p3.purify_plane0(yr, yi)
            return jnp.where(mask, qr, 0), jnp.where(mask, qi, 0)

        pr, pi = jax.jit(prep)(jnp.asarray(fu.real.astype(np.float32)),
                               jnp.asarray(fu.imag.astype(np.float32)))
        W = np.asarray(jax.jit(lambda x, y: p3.curl_irfft3d_packed(
            x, y, jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
            (N0, N1, N2)))(pr, pi))
        full = np.asarray(pr) + 1j * np.asarray(pi)
        full = np.concatenate([full, np.zeros_like(full[..., :1])], -1)
        Kf = np.meshgrid(k0.astype(np.float64), k1.astype(np.float64),
                         np.arange(h + 1, dtype=np.float64), indexing="ij")
        cu = 1j * np.stack([Kf[1] * full[2] - Kf[2] * full[1],
                            Kf[2] * full[0] - Kf[0] * full[2],
                            Kf[0] * full[1] - Kf[1] * full[0]])
        refn = np.fft.irfftn(cu, s=(N0, N1, N2), axes=(1, 2, 3))
        return np.abs(W - refn).max() / np.abs(refn).max()
    case("curl_irfft3d_packed 768 curl-only", curl_768)

    print(json.dumps({"rows": rows}), flush=True)


if __name__ == "__main__":
    main()
