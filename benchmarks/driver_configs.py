"""BASELINE.md eval-config sweep (configs 1-5, scaled to available devices).

Run on TPU:  PYTHONPATH=... python benchmarks/driver_configs.py
Run on CPU mesh: JAX_PLATFORMS=cpu python benchmarks/driver_configs.py --cpu8
CI smoke:    python benchmarks/driver_configs.py --cpu8 --smoke

Prints one JSON line per config: time, accuracy, transpose GB/s/chip; with
``--out FILE`` also writes the summary JSON there (recorded sweeps live in
benchmarks/results/).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    if "--cpu8" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    smoke = "--smoke" in sys.argv
    import jax
    from mpifft4py_tpu import slab, line, pencil
    from mpifft4py_tpu.utils.profiling import measure, transpose_stats

    ndev = len(jax.devices())
    TAU = 2 * np.pi
    rng = np.random.default_rng(0)
    results = []

    def report(name, FFT, t_rt, err):
        st = transpose_stats(FFT, t_rt)
        row = {"config": name, "roundtrip_ms": round(t_rt * 1e3, 3),
               "max_rel_err": float(err), "devices": FFT.P,
               "transpose_GBps_chip": round(st.gb_per_s_per_chip, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)

    # 1. slab R2C 64^3 "double", round-trip vs numpy.fft.rfftn
    N = 64
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), None, "double")
    u = rng.standard_normal((N, N, N))
    if FFT.policy.path == "doubleword":
        fu = FFT.fftn(u)
        out = FFT.gather_dd(fu)
        ub = FFT.gather_dd(FFT.ifftn(fu))
    else:
        fu = FFT.fftn(u)
        out = FFT.gather(fu)
        ub = np.asarray(FFT.ifftn(fu))
    ref = np.fft.rfftn(u)
    err = max(np.abs(out - ref).max() / np.abs(ref).max(),
              np.abs(ub - u).max() / np.abs(u).max())
    fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
    t = measure(lambda v: bwd(fwd(v)),
                FFT.shard_real_dd(u) if FFT.policy.path == "doubleword"
                else FFT.shard_real(u))
    report("1_slab_r2c_64cubed_double", FFT, t, err)

    # 2. line R2C 512^2
    N = 128 if smoke else 512
    FFT = line.R2C(np.array([N, N]), np.array([TAU, TAU]), None, "single")
    u32 = rng.standard_normal((N, N)).astype(np.float32)
    fu = FFT.fft2(u32)
    out = FFT.gather(fu)[:, :FFT.Nf]
    ref = np.fft.rfft2(u32.astype(np.float64))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
    t = measure(lambda v: bwd(fwd(v)), FFT.shard_real(u32))
    report("2_line_r2c_512sq", FFT, t, err)

    # 3. slab R2C 256^3 with dealiased (2/3-rule and 3/2-rule) transforms
    N = 32 if smoke else (256 if jax.default_backend() == "tpu" else 64)
    FFT = slab.R2C(np.array([N] * 3), np.array([TAU] * 3), None, "single")
    u32 = rng.standard_normal((N, N, N)).astype(np.float32)
    fwd23 = FFT.forward_fn("2/3-rule")
    bwd = FFT.backward_fn()
    t = measure(lambda v: bwd(fwd23(v)), FFT.shard_real(u32))
    # accuracy via plain roundtrip (relative — the driver's units)
    ub = np.asarray(FFT.ifftn(FFT.fftn(u32)))
    err = np.abs(ub - u32).max() / np.abs(u32).max()
    report("3_slab_r2c_dealiased", FFT, t, err)
    # 3b. padded variant: fftn(3/2) ∘ ifftn(3/2) on the spectrum
    fwd32, bwd32 = FFT.forward_fn("3/2-rule"), FFT.backward_fn("3/2-rule")
    fu0 = FFT.fftn(u32)
    t32 = measure(lambda f: fwd32(bwd32(f)), fu0)
    report("3b_slab_r2c_padded32", FFT, t32, err)

    # 4s. pencil on ONE chip (P1=P2=1: both grouped all-to-alls degenerate;
    # P2==1 routes through the packed MXU pipeline) — records config 4's
    # decomposition class on real TPU hardware where only one chip exists
    if ndev < 4:
        N = 32 if smoke else (256 if jax.default_backend() == "tpu" else 64)
        FFT = pencil.R2C(np.array([N] * 3), np.array([TAU] * 3), 1, "single")
        u32 = rng.standard_normal((N, N, N)).astype(np.float32)
        out = FFT.gather(FFT.fftn(u32))[..., :FFT.Nf]
        ref = np.fft.rfftn(u32.astype(np.float64))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
        t = measure(lambda v: bwd(fwd(v)), FFT.shard_real(u32))
        report("4s_pencil_r2c_single_chip", FFT, t, err)

    # 4. pencil R2C on a 2D mesh (P1xP2)
    if ndev >= 4:
        N = 32 if smoke else (256 if jax.default_backend() == "tpu" else 64)
        FFT = pencil.R2C(np.array([N] * 3), np.array([TAU] * 3), None, "single")
        u32 = rng.standard_normal((N, N, N)).astype(np.float32)
        fu = FFT.fftn(u32)
        out = FFT.gather(fu)[..., :FFT.Nf]
        ref = np.fft.rfftn(u32.astype(np.float64))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
        t = measure(lambda v: bwd(fwd(v)), FFT.shard_real(u32))
        report("4_pencil_r2c_2dmesh", FFT, t, err)

        # 5. DNS-style dealiased transform loop, overlapped transpose/FFT:
        # 3/2-rule padded inverse+forward with pipelined collectives (the
        # BASELINE config-5 shape: spectrum -> padded physical -> spectrum)
        FFTp = pencil.R2C(np.array([N] * 3), np.array([TAU] * 3), None, "single",
                          communication="pipelined")
        fwd32, bwd32 = FFTp.forward_fn("3/2-rule"), FFTp.backward_fn("3/2-rule")
        fu0 = FFTp.shard_complex(FFT.gather(fu))
        t = measure(lambda f: fwd32(bwd32(f)), fu0)
        report("5_pencil_dns_overlapped_padded", FFTp, t, err)

    # 6. transpose GB/s/chip, MEASURED (BASELINE.json:2's second metric).
    # One chip cannot exercise ICI; the honest hardware proxy is the P=1
    # self-RDMA all-to-all through the SAME Pallas kernel machinery the
    # multi-chip transpose uses — a straight HBM->HBM copy, so the number is
    # the HBM floor the transpose rides, not an ICI measurement.
    try:
        import jax as _jax
        from jax.sharding import PartitionSpec as _P
        from mpifft4py_tpu.parallel.mesh import AXIS, slab_mesh
        from mpifft4py_tpu.parallel.rdma import rdma_all_to_all, rdma_interpret

        mesh = slab_mesh(1)
        # payload large enough to amortise the ~1.3 ms kernel/barrier
        # overhead (measured: 32 MiB -> 25 GB/s, 512 MiB -> 113 GB/s payload;
        # marginal rate ~150 GB/s payload = ~300 GB/s HBM read+write)
        shape = (64, 64, 128) if (smoke or jax.default_backend() != "tpu") \
            else (512, 512, 512)
        x = jax.device_put(
            rng.standard_normal(shape).astype(np.float32),
            jax.sharding.NamedSharding(mesh, _P(AXIS, None, None)))
        interp = rdma_interpret()

        def selfcopy(v):
            return rdma_all_to_all(v, AXIS, 1, 0, 1, mesh_axes=(AXIS,),
                                   interpret=interp)
        fn = _jax.shard_map(selfcopy, mesh=mesh,
                            in_specs=_P(AXIS, None, None),
                            out_specs=_P(AXIS, None, None), check_vma=False)
        t_copy = measure(fn, x, iters=20)
        payload = int(np.prod(shape)) * 4
        row = {"config": "6_rdma_selfcopy_transpose_bw",
               "roundtrip_ms": round(t_copy * 1e3, 3),
               "payload_bytes": payload,
               "transpose_GBps_chip": round(payload / t_copy / 1e9, 2),
               "devices": 1,
               "note": "P=1 self-RDMA HBM copy via the rdma transpose kernel; "
                       "ICI untestable on one chip"}
        results.append(row)
        print(json.dumps(row), flush=True)
    except Exception as e:  # never fail the sweep over the proxy metric
        print(json.dumps({"config": "6_rdma_selfcopy_transpose_bw",
                          "error": repr(e)[:200]}), flush=True)

    print(json.dumps({"summary": results}))
    if "--out" in sys.argv:
        path = sys.argv[sys.argv.index("--out") + 1]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"backend": jax.default_backend(), "devices": ndev,
                       "smoke": smoke, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
