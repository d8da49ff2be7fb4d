"""Pencil (2D) decomposition of 3D FFTs — TPU-native.

Reference analog: ``mpiFFT4py/pencil.py`` ``R2C`` on a P1×P2 process grid
(reference mount empty at build time; parity target SURVEY.md §2.1 #4, §3.4).
Algorithm (the textbook pencil pipeline):

    forward:  local rfft(axis 2) → transpose over P2 → local fft(axis 1)
              → transpose over P1 → local fft(axis 0)
    inverse:  mirror image.

TPU-native mapping:

* process grid        = 2D ``Mesh`` with axes ``("p1", "p2")`` — the two
  orthogonal sub-communicators the reference builds with ``Comm.Split`` are
  exactly the named mesh axes; each ``lax.all_to_all`` over one name is an
  Alltoall within one P1- or P2-sized group, riding ICI.
* layouts (global shapes; X-aligned spectral pencils, reference default):

      physical: real    (N0, N1, N2)    sharded P("p1", "p2", None)
      spectral: complex (N0, N1, Nfp)   sharded P(None, "p1", "p2")

* uneven Hermitian axis: pencil *must* shard the halved axis (Nf = N2//2+1,
  odd).  MPI does uneven blocks with Alltoallw derived datatypes; the static-
  shape TPU equivalent is alignment padding to ``Nfp = ceil(Nf/P2)·P2`` with
  structural zero modes k >= Nf (transparent to spectral algebra, removed by
  every dealias mask, sliced off before the final irfft).
* ``alignment="X"`` (reference kwarg) selects which axis the spectral array
  is aligned with.  "X" (axis 0 local, transpose order z→y→x — the reference
  default): spectral P(None, "p1", "p2").  "Y" (axis 1 local, order z→x→y):
  spectral P("p2", None, "p1") with the Hermitian axis padded over P1.

Divisibility requirements (hard asserts, reference-parity): P1 | N0, P2 | N1,
P1 | N1; padded variants additionally need P1 | M0, P2 | M1.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from .base import BaseFFT, local_wavenumber_full
from .slab import _PackedDist1D
from .parallel.mesh import AXIS1, AXIS2, pencil_mesh, check_divisible
from .ops import fft_core as fc
from .utils.spectral import (
    pad_full_axis, trunc_full_axis, pad_half_axis, trunc_half_axis,
    dealias_cutoffs, flip_conj_plane,
)

__all__ = ["R2C", "C2C"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class _Pencil3D(_PackedDist1D, BaseFFT):
    """Shared pencil machinery; subclasses fix the last-axis transform
    (R2C: halved Hermitian axis with Nfp alignment padding; C2C: full
    complex axis, divisibility-sharded)."""

    ndim = 3
    _dist_axis = AXIS1  # the one live transpose axis when P2 == 1 (packed path)
    _is_r2c = True

    def __init__(self, N, L, comm=None, precision: str = "single", *,
                 P1=None, alignment: str = "X", **kw):
        if alignment not in ("X", "Y"):
            raise ValueError(f"alignment must be 'X' or 'Y', got {alignment!r}")
        self.alignment = alignment
        self._P1_req = P1
        super().__init__(N, L, comm, precision, **kw)

    def _make_mesh(self, comm):
        return pencil_mesh(comm, P1=self._P1_req)

    def _validate(self):
        if self.policy.path == "doubleword":
            from .ops import dd_fft  # noqa: F401
        self.P1 = int(self.mesh.shape[AXIS1])
        self.P2 = int(self.mesh.shape[AXIS2])
        check_divisible(self.N[0], self.P1, "pencil real axis 0 (P1)")
        check_divisible(self.N[1], self.P2, "pencil real axis 1 (P2)")
        check_divisible(self.N[1], self.P1, "pencil spectral axis 1 (P1)")
        for n in self.N:
            if n % 2:
                raise ValueError(f"grid sizes must be even, got {tuple(self.N)}")
        M = self.padsize * self.N
        if not np.allclose(M, np.round(M)):
            raise ValueError(f"padsize*N must be integral, got {M}")
        self.M = np.round(M).astype(np.int64)
        # last-axis spectral widths: R2C halves (Hermitian, Nf odd → Nfp
        # alignment padding); C2C keeps the full axis (divisibility-sharded,
        # no padding — fftshift layout makes end-padding meaningless).
        if self._is_r2c:
            self.Nf = int(self.N[2]) // 2 + 1
            self.Mf = int(self.M[2]) // 2 + 1
        else:
            self.Nf = int(self.N[2])
            self.Mf = int(self.M[2])
        # X-aligned shards the Hermitian axis over P2; Y-aligned (mirror
        # transpose order z→x→y) shards it over P1 and the leading axis over P2.
        if self.alignment == "Y":
            check_divisible(self.N[0], self.P2, "pencil Y spectral axis 0 (P2)")
            self.Nfp = _cdiv(self.Nf, self.P1) * self.P1
        else:
            self.Nfp = _cdiv(self.Nf, self.P2) * self.P2
        if not self._is_r2c and self.Nfp != self.Nf:
            ax, p = (("P1", self.P1) if self.alignment == "Y"
                     else ("P2", self.P2))
            raise ValueError(f"pencil C2C needs {ax} | N2 "
                             f"(got N2={self.Nf}, {ax}={p})")

    # -- shapes -----------------------------------------------------------------

    def real_shape(self):
        return (int(self.N[0]) // self.P1, int(self.N[1]) // self.P2, int(self.N[2]))

    def complex_shape(self):
        if self.alignment == "Y":
            return (int(self.N[0]) // self.P2, int(self.N[1]), self.Nfp // self.P1)
        return (int(self.N[0]), int(self.N[1]) // self.P1, self.Nfp // self.P2)

    def global_real_shape(self):
        return tuple(int(n) for n in self.N)

    def global_complex_shape(self):
        return (int(self.N[0]), int(self.N[1]), self.Nfp)

    def real_shape_padded(self):
        return (int(self.M[0]) // self.P1, int(self.M[1]) // self.P2, int(self.M[2]))

    def global_real_shape_padded(self):
        return tuple(int(m) for m in self.M)

    def work_shape(self, dealias=None):
        return self.real_shape_padded() if dealias == "3/2-rule" else self.real_shape()

    def real_local_slice(self, coords=(0, 0), padsize: float = 1.0):
        r1, r2 = coords
        n0 = int(round(padsize * self.N[0])) // self.P1
        n1 = int(round(padsize * self.N[1])) // self.P2
        return (slice(r1 * n0, (r1 + 1) * n0), slice(r2 * n1, (r2 + 1) * n1),
                slice(0, int(round(padsize * self.N[2]))))

    def complex_local_slice(self, coords=(0, 0)):
        r1, r2 = coords
        if self.alignment == "Y":
            n0 = int(self.N[0]) // self.P2
            nf = self.Nfp // self.P1
            return (slice(r2 * n0, (r2 + 1) * n0), slice(0, int(self.N[1])),
                    slice(r1 * nf, (r1 + 1) * nf))
        n1 = int(self.N[1]) // self.P1
        nf = self.Nfp // self.P2
        return (slice(0, int(self.N[0])), slice(r1 * n1, (r1 + 1) * n1),
                slice(r2 * nf, (r2 + 1) * nf))

    # -- shardings ----------------------------------------------------------------

    def real_spec(self):
        return P(AXIS1, AXIS2, None)

    def complex_spec(self):
        if self.alignment == "Y":
            return P(AXIS2, None, AXIS1)
        return P(None, AXIS1, AXIS2)

    # -- wavenumbers / masks ---------------------------------------------------------

    def _k2_chunk(self, nf, r, dtype):
        """Local chunk of last-axis wavenumbers (R2C: non-negative rfft
        indices; C2C override: signed fft-layout values)."""
        return (r * nf + jnp.arange(nf)).astype(dtype)

    def _k_local(self, dtype):
        N0, N1 = int(self.N[0]), int(self.N[1])
        multi = self.P > 1
        r1 = lax.axis_index(AXIS1) if multi else 0
        r2 = lax.axis_index(AXIS2) if multi else 0
        if self.alignment == "Y":
            n0 = N0 // self.P2
            nf = self.Nfp // self.P1
            k0 = local_wavenumber_full(N0, n0, r2, dtype)
            k1 = local_wavenumber_full(N1, N1, 0, dtype)
            return k0, k1, self._k2_chunk(nf, r1, dtype)
        n1 = N1 // self.P1
        nf = self.Nfp // self.P2
        k0 = local_wavenumber_full(N0, N0, 0, dtype)
        k1 = local_wavenumber_full(N1, n1, r1, dtype)
        return k0, k1, self._k2_chunk(nf, r2, dtype)

    def _mesh_build(self, builder, out_spec):
        if self.P == 1:
            return jax.jit(builder)()
        return jax.jit(self._smap(builder, in_specs=(), out_specs=out_spec))()

    def get_local_wavenumbermesh(self):
        def build():
            k0, k1, k2 = self._k_local(self.float)
            return jnp.stack(jnp.meshgrid(k0, k1, k2, indexing="ij"))
        return self._mesh_build(build, P(*((None,) + tuple(self.complex_spec()))))

    def get_scaled_local_wavenumbermesh(self):
        s = (2 * np.pi / self.L).astype(self.float)
        def build():
            k0, k1, k2 = self._k_local(self.float)
            return jnp.stack(jnp.meshgrid(k0 * s[0], k1 * s[1], k2 * s[2],
                                          indexing="ij"))
        return self._mesh_build(build, P(*((None,) + tuple(self.complex_spec()))))

    def get_dealias_filter(self):
        def build():
            return self._dealias_local()
        return self._mesh_build(build, self.complex_spec())

    def _dealias_local(self):
        c = dealias_cutoffs(self.N)
        k0, k1, k2 = self._k_local(jnp.float32)
        return ((jnp.abs(k0)[:, None, None] < c[0])
                & (jnp.abs(k1)[None, :, None] < c[1])
                & (jnp.abs(k2)[None, None, :] < c[2]))

    def get_local_mesh(self):
        N = [int(n) for n in self.N]
        d = (self.L / self.N).astype(self.float)
        n0, n1 = N[0] // self.P1, N[1] // self.P2
        multi = self.P > 1
        def build():
            r1 = lax.axis_index(AXIS1) if multi else 0
            r2 = lax.axis_index(AXIS2) if multi else 0
            x0 = (r1 * n0 + jnp.arange(n0, dtype=self.float)) * d[0]
            x1 = (r2 * n1 + jnp.arange(n1, dtype=self.float)) * d[1]
            x2 = jnp.arange(N[2], dtype=self.float) * d[2]
            return jnp.stack(jnp.meshgrid(x0, x1, x2, indexing="ij"))
        return self._mesh_build(build, P(None, AXIS1, AXIS2, None))

    # -- local pipelines -----------------------------------------------------------

    def _align_pad2(self, x):
        if x.shape[2] == self.Nfp:
            return x
        return jnp.pad(x, [(0, 0), (0, 0), (0, self.Nfp - x.shape[2])])

    # -- Pallas distributed pipeline (MXU local stages on EVERY rank) ----------
    #
    # Pencil analog of slab's distributed fast tier (VERDICT r1 item 2): the
    # local z/y/x stages run the planar MXU kernels and the two grouped
    # all-to-alls move the (re, im) float32 pair.  The PLANAR (not packed)
    # z-layout is used because pencil shards the Hermitian axis: planar
    # stores X[k] directly (no plane-0 riders), so slicing to the alignment
    # width Nfp and the existing transpose choreography apply unchanged.
    # Cost note: the y/x kernels see Nfp/P2 lanes — below 128 Mosaic pads the
    # lane dim, wasting bandwidth on those stages for large P2; a packed
    # layout with halo re-alignment would fix that (future work).

    def _kernel_gates_ok(self, dealias) -> bool:
        import os
        if os.environ.get("MPIFFT4PY_TPU_PALLAS", "1") in ("0", "false"):
            return False
        if self.policy.path != "native" or self.float != np.float32:
            return False
        if not (jax.default_backend() == "tpu"
                or os.environ.get("MPIFFT4PY_TPU_PALLAS_DIST") == "force"):
            return False
        from .ops import pallas_fft3d as p3
        if dealias == "3/2-rule":
            # padded variant: local FFTs run at the M sizes (truncation to
            # the N grid is folded into each stage's work_fn)
            M0, M1 = int(self.M[0]), int(self.M[1])
            return (self._z_kernel_ok(padded=True) and p3.supported_c2c(M0)
                    and p3.supported_c2c(M1))
        N0, N1 = int(self.N[0]), int(self.N[1])
        return (self._z_kernel_ok() and p3.supported_c2c(N0)
                and p3.supported_c2c(N1))

    def _z_kernel_ok(self, padded: bool = False) -> bool:
        from .ops import pallas_fft3d as p3
        return p3.supported_r2c(int(self.M[2] if padded else self.N[2]))

    def _packed_dist_ok(self, dealias) -> bool:
        # P2 == 1: the first (P2-group) all-to-all is degenerate and the
        # choreography collapses to slab's single transpose over P1 — run the
        # packed-Hermitian MXU pipeline (_PackedDist1D, z-width exactly N2/2,
        # no Nfp lane padding, fused z+y eligible).  Output width Nf == Nfp.
        # X-aligned only: the collapsed choreography produces the slab
        # spectral layout, which is what alignment="X" commits to.
        return (self._is_r2c and self.P2 == 1 and self.alignment == "X"
                and dealias != "3/2-rule"
                and (int(self.N[2]) // 2) % 128 == 0
                and self._kernel_gates_ok(dealias))

    def _pallas_dist_ok(self, dealias) -> bool:
        return self.P2 <= 128 and self._kernel_gates_ok(dealias)

    def _packed_iface_ok(self, dealias) -> bool:
        # packed planar interface: P2==1 rides the slab-collapsed
        # _PackedDist1D pipeline; P2>1 rides the WIDE choreography below
        return self._packed_dist_ok(dealias) or self._packed_wide_ok(dealias)

    # -- packed WIDE choreography (P2 > 1): full-lane packed pipeline ---------
    #
    # The reference pencil spectral layout shards the Hermitian axis over P2,
    # which leaves the y/x-stage kernels Nfp/P2 lanes — below 128 Mosaic pads
    # the lane dim, wasting MXU cycles and VMEM bandwidth (VERDICT r2 weak #1;
    # measured single-chip: planar pencil 5.17 ms vs packed 3.51 ms at 256³).
    # The packed interface is NOT reference API, so its spectral layout is
    # free: keep the packed z-width h fully lane-resident and shard ROWS —
    #
    #     physical   (N0/P1, N1/P2, N2)      P("p1","p2",None)
    #  z→ packed     (N0/P1, N1/P2, h)
    #  a2a(P2: split 0 → concat 1)  → (N0/(P1·P2), N1, h)   y-FFT @ h lanes
    #  a2a((p1,p2): split 1 → concat 0) → (N0, N1/(P1·P2), h)  x-FFT @ h lanes
    #
    # Spectral state (N0, N1/(P1·P2), h), spec P(None, ("p1","p2"), None).
    # Same collective COUNT as the standard forward (2); the second rides the
    # joint P1×P2 group (≈ full-pair volume vs (P1−1)/P1 — the price of full
    # lanes).  Spectral algebra is elementwise ⇒ the DNS packed solver works
    # unchanged on this layout.  Requires P1·P2 | N0 and P1·P2 | N1.

    def _packed_wide_ok(self, dealias) -> bool:
        if not (self._is_r2c and self.P2 > 1 and dealias != "3/2-rule"):
            return False
        if (int(self.N[2]) // 2) % 128 != 0:
            return False
        if not self._kernel_gates_ok(dealias):
            return False
        g = self.P1 * self.P2
        return int(self.N[0]) % g == 0 and int(self.N[1]) % g == 0

    def _packed_spec(self):
        if self.P2 > 1:
            return P(None, (AXIS1, AXIS2), None)
        return self.complex_spec()

    def _nl_dist_ok(self, dealias) -> bool:
        # P2 == 1 collapses to the slab 1D pipeline and inherits the fused
        # path unchanged; P2 > 1 rides the WIDE choreography with the hooks
        # below (z-only fused cross, y after the P2 a2a, x-epilogue after
        # the joint a2a)
        if self.P2 > 1:
            from .ops import pallas_fft3d as p3
            return (dealias == "2/3-rule" and self._packed_wide_ok(dealias)
                    and p3.fft_x_epilogue_ok(int(self.N[0])))
        return _PackedDist1D._nl_dist_ok(self, dealias)

    def _nl_pair_pre_x(self, a, b, c, d, op):
        """WIDE-layout leg of the fused nonlinear forward: the y axis is
        sharded in physical space, so only the z-rfft fuses behind the
        shard-local cross (cross_rfft_z_packed); y transforms as the P2
        stage's work_fn and x waits for the joint transpose (the epilogue
        kernel transforms it)."""
        if self.P2 == 1:
            return _PackedDist1D._nl_pair_pre_x(self, a, b, c, d, op)
        from .ops import pallas_fft3d as p3
        mul, two = op == "mul", op == "cross2"
        R = a.shape[1] * a.shape[2]
        n2 = a.shape[-1]
        if p3.cross_z_ok(n2, R, two=two, mul=mul):
            fzr, fzi = (p3.mul_rfft_z_packed(a, b, dif=True) if mul
                        else p3.cross_rfft_z_packed(a, b, c, d, dif=True))
        else:
            fzr, fzi = p3.rfft_last_packed(self._xla_cross(a, b, c, d, op),
                                           dif=True)
        pair = self._stage((fzr, fzi), AXIS2, 1, 2,
                           lambda t: p3.fft_axis_planar(t[0], t[1], axis=2),
                           pipeline_axis=3)
        return self._stage_joint(pair, (AXIS1, AXIS2), 2, 1,
                                 pipeline_axis=3)

    def _nl_purify(self, dr, di):
        if self.P2 == 1:
            return _PackedDist1D._nl_purify(self, dr, di)
        return self._purify_plane0_wide(dr, di)

    def _stage_joint(self, x, axes, split_axis, concat_axis,
                     work_fn=None, *, pipeline_axis, pre_fn=None):
        """Transpose stage over the JOINT (P1×P2) group.  rdma kernels
        address peers on ONE mesh axis, so communication='rdma' rides the
        XLA all-to-all here (the P2-group stage still uses rdma)."""
        from .parallel.collectives import transpose, transpose_pipelined
        g = int(np.prod([self.mesh.shape[a] for a in axes]))
        if g == 1:
            if pre_fn is not None:
                x = pre_fn(x)
            return work_fn(x) if work_fn is not None else x
        if self.communication == "pipelined":
            return transpose_pipelined(x, axes, split_axis, concat_axis,
                                       work_fn, pipeline_axis,
                                       nchunks=self._nchunks, pre_fn=pre_fn,
                                       group_size=g)
        if pre_fn is not None:
            x = pre_fn(x)
        x = transpose(x, axes, split_axis, concat_axis)
        return work_fn(x) if work_fn is not None else x

    def _k1_index_wide(self):
        return lax.axis_index((AXIS1, AXIS2))

    def _packed_mask_wide(self, h):
        c = dealias_cutoffs(self.N)
        N0, N1 = int(self.N[0]), int(self.N[1])
        n1 = N1 // (self.P1 * self.P2)
        r = self._k1_index_wide()
        k0 = local_wavenumber_full(N0, N0, 0, jnp.float32)
        k1 = local_wavenumber_full(N1, n1, r, jnp.float32)
        k2 = jnp.arange(h, dtype=jnp.float32)
        perm = self.packed_z_perm
        if perm is not None:
            k2 = k2[jnp.asarray(perm)]
        return ((jnp.abs(k0)[:, None, None] < c[0])
                & (jnp.abs(k1)[None, :, None] < c[1])
                & (k2[None, None, :] < c[2]))

    def _purify_plane0_wide(self, yr, yi):
        """Drop the Nyquist rider from packed plane 0; the (k0, k1) plane's
        k1 axis is sharded over the joint group — gather just that plane."""
        from .ops import pallas_fft3d as p3
        qr, qi = yr[..., 0], yi[..., 0]
        axes = (qr.ndim - 2, qr.ndim - 1)
        ax = qr.ndim - 1
        gr = lax.all_gather(qr, (AXIS1, AXIS2), axis=ax, tiled=True)
        gi = lax.all_gather(qi, (AXIS1, AXIS2), axis=ax, tiled=True)
        fr, fi = p3._flipconj(gr, gi, axes)
        n1 = qr.shape[ax]
        r = self._k1_index_wide()
        cr = lax.dynamic_slice_in_dim(fr, r * n1, n1, ax)
        ci = lax.dynamic_slice_in_dim(fi, r * n1, n1, ax)
        p0r = 0.5 * (qr + cr)
        p0i = 0.5 * (qi + ci)
        return (jnp.concatenate([p0r[..., None], yr[..., 1:]], axis=-1),
                jnp.concatenate([p0i[..., None], yi[..., 1:]], axis=-1))

    def _fwd_local_packed(self, u, dealias):
        if self.P2 == 1:
            return _PackedDist1D._fwd_local_packed(self, u, dealias)
        from .ops import pallas_fft3d as p3
        off = u.ndim - 3
        yr, yi = p3.rfft_last_packed(u, dif=True)
        pair = self._stage((yr, yi), AXIS2, off, 1 + off,
                           lambda t: p3.fft_axis_planar(t[0], t[1],
                                                        axis=1 + off),
                           pipeline_axis=2 + off)
        pair = self._stage_joint(pair, (AXIS1, AXIS2), 1 + off, off,
                                 lambda t: p3.fft_axis_planar(t[0], t[1],
                                                              axis=off),
                                 pipeline_axis=2 + off)
        yr, yi = pair
        if dealias == "2/3-rule":
            yr, yi = self._purify_plane0_wide(yr, yi)
            m = self._packed_mask_wide(yr.shape[-1])
            yr, yi = jnp.where(m, yr, 0), jnp.where(m, yi, 0)
        return yr, yi

    def _bwd_local_packed(self, pair, dealias):
        if self.P2 == 1:
            return _PackedDist1D._bwd_local_packed(self, pair, dealias)
        from .ops import pallas_fft3d as p3
        yr, yi = pair
        off = yr.ndim - 3
        if dealias == "2/3-rule":
            m = self._packed_mask_wide(yr.shape[-1])
            yr, yi = jnp.where(m, yr, 0), jnp.where(m, yi, 0)
        pair = self._stage_joint(
            (yr, yi), (AXIS1, AXIS2), off, 1 + off, pipeline_axis=2 + off,
            pre_fn=lambda t: p3.fft_axis_planar(t[0], t[1], axis=off,
                                                inverse=True))
        pair = self._stage(
            pair, AXIS2, 1 + off, off, pipeline_axis=2 + off,
            pre_fn=lambda t: p3.fft_axis_planar(t[0], t[1], axis=1 + off,
                                                inverse=True))
        return p3.irfft_last_packed(pair[0], pair[1], int(self.N[2]),
                                    dif=True).astype(self.float)

    def _z_fwd_planar(self, u):
        """Local z-stage of the planar MXU pipeline (R2C: rectangular real
        matmuls to the Nfp alignment width; C2C override: dense c2c lanes)."""
        from .ops import pallas_fft3d as p3
        yr, yi = p3.rfft_last_planar(u)           # (n0, n1, round_up(Nf,128))
        return p3.fit_width(yr, yi, self.Nfp)

    def _z_bwd_planar(self, pr, pi):
        from .ops import pallas_fft3d as p3
        w = p3._round_up(self.Nf, 128)
        yr, yi = p3.fit_width(pr[..., :self.Nf], pi[..., :self.Nf], w)
        return p3.irfft_last_planar(yr, yi, int(self.N[2])).astype(self.float)

    def _fwd_dist_planar(self, u, dealias):
        from .ops import pallas_fft3d as p3
        padded = dealias == "3/2-rule"
        N0, N1 = int(self.N[0]), int(self.N[1])
        if padded:
            yr, yi = self._z_fwd_planar_padded(u)  # trunc + 1/padsize³ folded
        else:
            yr, yi = self._z_fwd_planar(u)

        def fftw(axis, n):
            # local FFT (+ padded truncation) as the stage work_fn
            def w(t):
                ar, ai = p3.fft_axis_planar(t[0], t[1], axis=axis)
                if padded:
                    return (trunc_full_axis(ar, axis, n),
                            trunc_full_axis(ai, axis, n))
                return ar, ai
            return w

        # rdma megakernels implement the X choreography at unpadded sizes;
        # Y / padded ride the generic _stage (which serves rdma a2a too)
        use_rdma = (self.communication == "rdma" and self.alignment == "X"
                    and not padded)
        if self.alignment == "Y":
            pair = self._stage((yr, yi), AXIS1, 2, 0, fftw(0, N0),
                               pipeline_axis=1)
            pair = self._stage(pair, AXIS2, 0, 1, fftw(1, N1),
                               pipeline_axis=2)
        else:
            if use_rdma and self.P2 > 1:
                # y-stage megakernel over the P2 group (parallel.rdma)
                from .parallel.rdma import fused_transpose_fft_y, rdma_interpret
                interp = rdma_interpret()
                pair = fused_transpose_fft_y(
                    yr, yi, AXIS2, self.P2, mesh_axes=self.mesh.axis_names,
                    nchunks=self._nchunks, interpret=interp)
            else:
                pair = self._stage((yr, yi), AXIS2, 2, 1, fftw(1, N1),
                                   pipeline_axis=0)
            if use_rdma and self.P1 > 1:
                # x-stage megakernel: transpose + x-FFT fused with DMA overlap
                # (same (rows, N1, lanes) pattern as the slab forward)
                from .parallel.rdma import fused_transpose_fft_x, rdma_interpret
                interp = rdma_interpret()
                pair = fused_transpose_fft_x(
                    pair[0], pair[1], AXIS1, self.P1,
                    mesh_axes=self.mesh.axis_names, nchunks=self._nchunks,
                    interpret=interp)
            else:
                pair = self._stage(pair, AXIS1, 1, 0, fftw(0, N0),
                                   pipeline_axis=2)
        x = lax.complex(pair[0], pair[1])
        if padded:
            return self._fix_nyq(x)  # 1/padsize³ folded into the z stage
        if dealias == "2/3-rule":
            x = jnp.where(self._dealias_local(), x, 0)
        return x

    def _bwd_dist_planar(self, fu, dealias):
        from .ops import pallas_fft3d as p3
        padded = dealias == "3/2-rule"
        M0, M1 = int(self.M[0]), int(self.M[1])
        if dealias == "2/3-rule":
            fu = jnp.where(self._dealias_local(), fu, 0)
        pr = jnp.real(fu).astype(jnp.float32)
        pi = jnp.imag(fu).astype(jnp.float32)

        def ifftw(axis, m):
            # (padded zero-fill +) local inverse FFT as the stage pre_fn
            def w(t):
                ar, ai = t
                if padded:
                    ar = pad_full_axis(ar, axis, m)
                    ai = pad_full_axis(ai, axis, m)
                return p3.fft_axis_planar(ar, ai, axis=axis, inverse=True)
            return w

        use_rdma = (self.communication == "rdma" and self.alignment == "X"
                    and not padded)
        if self.alignment == "Y":
            pair = self._stage((pr, pi), AXIS2, 1, 0, pipeline_axis=2,
                               pre_fn=ifftw(1, M1))
            pair = self._stage(pair, AXIS1, 0, 2, pipeline_axis=1,
                               pre_fn=ifftw(0, M0))
        else:
            if use_rdma and self.P1 > 1:
                from .parallel.rdma import fused_ifft_x_transpose, rdma_interpret
                interp = rdma_interpret()
                pair = fused_ifft_x_transpose(
                    pr, pi, AXIS1, self.P1,
                    mesh_axes=self.mesh.axis_names, nchunks=self._nchunks,
                    interpret=interp)
            else:
                pair = self._stage((pr, pi), AXIS1, 0, 1, pipeline_axis=2,
                                   pre_fn=ifftw(0, M0))
            if use_rdma and self.P2 > 1:
                from .parallel.rdma import fused_ifft_y_transpose, rdma_interpret
                interp = rdma_interpret()
                pair = fused_ifft_y_transpose(
                    pair[0], pair[1], AXIS2, self.P2,
                    mesh_axes=self.mesh.axis_names, nchunks=self._nchunks,
                    interpret=interp)
            else:
                pair = self._stage(pair, AXIS2, 1, 2, pipeline_axis=0,
                                   pre_fn=ifftw(1, M1))
        if padded:
            return self._z_bwd_planar_padded(pair[0], pair[1])
        return self._z_bwd_planar(pair[0], pair[1])

    def _fwd_local(self, u, dealias):
        if self._packed_dist_ok(dealias):
            return self._fwd_dist_pallas(u, dealias)   # _PackedDist1D (slab-class)
        if self._pallas_dist_ok(dealias):
            return self._fwd_dist_planar(u, dealias)
        padded = dealias == "3/2-rule"
        N0, N1 = int(self.N[0]), int(self.N[1])
        x = self._fft_last(u)                     # (n0, n1, Nf|Mf widths)
        if padded:
            x = self._trunc_last(x)
        x = self._align_pad2(x)                        # (n0, n1, Nfp)

        def fft_t(axis, n):
            # local FFT + (padded) truncation folded into the stage work_fn —
            # under "pipelined" the chunk-c transpose overlaps chunk-(c−1)'s
            # FFT (BASELINE config 5), on the plain AND 3/2-rule paths.
            if padded:
                return lambda y: trunc_full_axis(fc.fft(y, axis=axis), axis, n)
            return lambda y: fc.fft(y, axis=axis)

        if self.alignment == "Y":
            # mirror transpose order z→x→y: Hermitian axis over P1, axis 0
            # over P2 in spectral space
            x = self._stage(x, AXIS1, 2, 0, fft_t(0, N0), pipeline_axis=1)
            x = self._stage(x, AXIS2, 0, 1, fft_t(1, N1), pipeline_axis=2)
        else:
            x = self._stage(x, AXIS2, 2, 1, fft_t(1, N1), pipeline_axis=0)
            x = self._stage(x, AXIS1, 1, 0, fft_t(0, N0), pipeline_axis=2)
        if padded:
            x = self._fix_nyq(x)
            return x * self.complex.type(1.0 / self.padsize ** 3)
        if dealias == "2/3-rule":
            x = jnp.where(self._dealias_local(), x, 0)
        return x

    def _fix_nyq(self, x):
        """Padded-forward Hermitian fix (R2C: symmetrize the z-Nyquist
        plane; C2C override: nothing to fix — no Hermitian constraint)."""
        return self._sym_nyq(x)

    def _sym_nyq(self, x):
        """Hermitian-symmetrize the z-Nyquist plane of a padded forward
        (see slab._Slab3D._sym_nyq).  The Hermitian axis is SHARDED here, so
        only the rank whose chunk holds global k2 = Nf−1 applies the fix; the
        in-plane flip spans one local full axis and one sharded axis (gather
        that single plane over the sharded axis' group)."""
        if self.alignment == "Y":
            # layout (n0, N1, nf1): axis 0 over P2, Hermitian over P1
            chunk = self.Nfp // self.P1
            plane_axes, gather_axis_name, gather_axis = (0, 1), AXIS2, 0
            herm_axis_name, herm_P = AXIS1, self.P1
        else:
            # layout (N0, n1, nf2): axis 1 over P1, Hermitian over P2
            chunk = self.Nfp // self.P2
            plane_axes, gather_axis_name, gather_axis = (0, 1), AXIS1, 1
            herm_axis_name, herm_P = AXIS2, self.P2
        rank_ny, off = divmod(self.Nf - 1, chunk)
        q = x[..., off]
        if self.P == 1:
            f = flip_conj_plane(q, plane_axes)
        elif int(self.mesh.shape[gather_axis_name]) == 1:
            f = flip_conj_plane(q, plane_axes)
        else:
            full = lax.all_gather(q, gather_axis_name, axis=gather_axis,
                                  tiled=True)
            f = flip_conj_plane(full, plane_axes)
            n_loc = q.shape[gather_axis]
            r = lax.axis_index(gather_axis_name)
            f = lax.dynamic_slice_in_dim(f, r * n_loc, n_loc, gather_axis)
        sym = 0.5 * (q + f)
        if herm_P > 1:
            here = lax.axis_index(herm_axis_name) == rank_ny
            sym = jnp.where(here, sym, q)
        return x.at[..., off].set(sym)

    def _bwd_local(self, fu, dealias):
        if self._packed_dist_ok(dealias):
            return self._bwd_dist_pallas(fu, dealias)   # _PackedDist1D
        if self._pallas_dist_ok(dealias):
            return self._bwd_dist_planar(fu, dealias)
        padded = dealias == "3/2-rule"
        M0, M1 = int(self.M[0]), int(self.M[1])
        if dealias == "2/3-rule":
            fu = jnp.where(self._dealias_local(), fu, 0)

        def ifft_p(axis, m):
            # (padded) zero-fill + local inverse FFT as the stage pre_fn: under
            # "pipelined" chunk c's transpose overlaps chunk (c+1)'s FFT.
            if padded:
                return lambda y: fc.ifft(pad_full_axis(y, axis, m), axis=axis)
            return lambda y: fc.ifft(y, axis=axis)

        if self.alignment == "Y":
            x = self._stage(fu, AXIS2, 1, 0, pipeline_axis=2, pre_fn=ifft_p(1, M1))
            x = self._stage(x, AXIS1, 0, 2, pipeline_axis=1, pre_fn=ifft_p(0, M0))
        else:
            x = self._stage(fu, AXIS1, 0, 1, pipeline_axis=2, pre_fn=ifft_p(0, M0))
            x = self._stage(x, AXIS2, 1, 2, pipeline_axis=0, pre_fn=ifft_p(1, M1))
        x = x[..., :self.Nf]                      # drop alignment padding
        if padded:
            x = self._pad_last(x)
            u = self._ifft_last(x, padded=True)
            return u * self.float.type(self.padsize ** 3)
        return self._ifft_last(x, padded=False)

    # -- double-word (emulated fp64) local pipelines ----------------------------------
    # Same choreography over DD/DDComplex float32-pair pytrees (see slab.py for
    # the design notes; TPU-validated <1e-14 relative).

    def _align_pad2_dd(self, x):
        if x.shape[2] == self.Nfp:
            return x
        pad = [(0, 0), (0, 0), (0, self.Nfp - x.shape[2])]
        return x._map(lambda v: jnp.pad(v, pad))

    def _fwd_local_dd(self, u, dealias):
        from .ops import dd_fft as df
        from .ops.doubledouble import DD, dd_where
        from .utils import spectral_dd as sdd

        padded = dealias == "3/2-rule"
        N0, N1 = int(self.N[0]), int(self.N[1])
        x = self._fft_last_dd(u)
        if padded:
            x = self._trunc_last_dd(x)
        x = self._align_pad2_dd(x)

        def fft_t(axis, n):
            if padded:
                return lambda y: sdd.trunc_full_axis_dd(
                    df.fft_dd(y, axis=axis), axis, n)
            return lambda y: df.fft_dd(y, axis=axis)

        if self.alignment == "Y":
            x = self._stage(x, AXIS1, 2, 0, fft_t(0, N0), pipeline_axis=1)
            x = self._stage(x, AXIS2, 0, 1, fft_t(1, N1), pipeline_axis=2)
        else:
            x = self._stage(x, AXIS2, 2, 1, fft_t(1, N1), pipeline_axis=0)
            x = self._stage(x, AXIS1, 1, 0, fft_t(0, N0), pipeline_axis=2)
        if padded:
            x = self._fix_nyq_dd(x)
            return x * DD.from_f64(np.array(1.0 / self.padsize ** 3))
        if dealias == "2/3-rule":
            x = dd_where(self._dealias_local(), x)
        return x

    def _fix_nyq_dd(self, x):
        return self._sym_nyq_dd(x)

    def _sym_nyq_dd(self, x):
        """Doubleword variant of _sym_nyq (same rank/offset bookkeeping)."""
        from .utils import spectral_dd as sdd
        if self.alignment == "Y":
            chunk = self.Nfp // self.P1
            gather_axis_name, gather_axis = AXIS2, 0
            herm_axis_name, herm_P = AXIS1, self.P1
        else:
            chunk = self.Nfp // self.P2
            gather_axis_name, gather_axis = AXIS1, 1
            herm_axis_name, herm_P = AXIS2, self.P2
        rank_ny, off = divmod(self.Nf - 1, chunk)
        q = x[..., off]
        if self.P == 1 or int(self.mesh.shape[gather_axis_name]) == 1:
            f = sdd.flip_conj_plane_dd(q, (0, 1))
        else:
            full = jax.tree.map(
                lambda v: lax.all_gather(v, gather_axis_name,
                                         axis=gather_axis, tiled=True), q)
            f = sdd.flip_conj_plane_dd(full, (0, 1))
            n_loc = q.shape[gather_axis]
            r = lax.axis_index(gather_axis_name)
            f = jax.tree.map(
                lambda v: lax.dynamic_slice_in_dim(v, r * n_loc, n_loc,
                                                   gather_axis), f)
        sym = (q + f)._map(lambda v: v * jnp.float32(0.5))
        cond = (lax.axis_index(herm_axis_name) == rank_ny) if herm_P > 1 else None
        return sdd.sym_select_set_dd(x, off, sym, cond)

    def _bwd_local_dd(self, fu, dealias):
        from .ops import dd_fft as df
        from .ops.doubledouble import DD, dd_where
        from .utils import spectral_dd as sdd

        padded = dealias == "3/2-rule"
        M0, M1 = int(self.M[0]), int(self.M[1])
        if dealias == "2/3-rule":
            fu = dd_where(self._dealias_local(), fu)

        def ifft_p(axis, m):
            if padded:
                return lambda y: df.ifft_dd(
                    sdd.pad_full_axis_dd(y, axis, m), axis=axis)
            return lambda y: df.ifft_dd(y, axis=axis)

        if self.alignment == "Y":
            x = self._stage(fu, AXIS2, 1, 0, pipeline_axis=2, pre_fn=ifft_p(1, M1))
            x = self._stage(x, AXIS1, 0, 2, pipeline_axis=1, pre_fn=ifft_p(0, M0))
        else:
            x = self._stage(fu, AXIS1, 0, 1, pipeline_axis=2, pre_fn=ifft_p(0, M0))
            x = self._stage(x, AXIS2, 1, 2, pipeline_axis=0, pre_fn=ifft_p(1, M1))
        x = x[..., :self.Nf]
        if padded:
            x = self._pad_last_dd(x)
            u = self._ifft_last_dd(x, padded=True)
            return u * DD.from_f64(np.array(self.padsize ** 3))
        return self._ifft_last_dd(x, padded=False)

    # -- public transforms ------------------------------------------------------------

    def _check_padded(self, dealias):
        if dealias == "3/2-rule":
            check_divisible(self.M[0], self.P1, "pencil padded axis 0 (P1)")
            check_divisible(self.M[1], self.P2, "pencil padded axis 1 (P2)")

    def forward_fn(self, dealias=None):
        self._check_padded(dealias)
        dd = self.policy.path == "doubleword"
        local = self._fwd_local_dd if dd else self._fwd_local
        if self.P == 1:
            return lambda u: local(u, dealias)
        return self._smap(lambda u: local(u, dealias),
                          in_specs=self.real_spec(), out_specs=self.complex_spec())

    def backward_fn(self, dealias=None):
        self._check_padded(dealias)
        dd = self.policy.path == "doubleword"
        local = self._bwd_local_dd if dd else self._bwd_local
        if self.P == 1:
            return lambda fu: local(fu, dealias)
        return self._smap(lambda fu: local(fu, dealias),
                          in_specs=self.complex_spec(), out_specs=self.real_spec())

    def shard_real_dd(self, u):
        from .ops.doubledouble import DD
        d = DD.from_f64(np.asarray(u, np.float64))
        sh = NamedSharding(self.mesh, self.real_spec())
        return jax.tree.map(lambda v: jax.device_put(v, sh), d)

    def shard_complex_dd(self, fu):
        from .ops.doubledouble import DDComplex
        d = DDComplex.from_c128(np.asarray(fu, np.complex128))
        sh = self.complex_sharding()
        return jax.tree.map(lambda v: jax.device_put(v, sh), d)

    def gather_dd(self, x):
        from .ops.doubledouble import DD, DDComplex
        if isinstance(x, DDComplex):
            return x.to_c128()
        if isinstance(x, DD):
            return x.to_f64()
        return self.gather(x)

    def fftn(self, u, fu=None, dealias=None):
        if self.policy.path == "doubleword":
            from .ops.doubledouble import DD, DDComplex
            if not isinstance(u, (DD, DDComplex)):
                u = self.shard_real_dd(u)
        else:
            u = self._coerce(u, self._in_dtype,
                             NamedSharding(self.mesh, self.real_spec()))
        plan = self._plan(("fftn", dealias), lambda: self.forward_fn(dealias))
        return plan(u)

    def ifftn(self, fu, u=None, dealias=None):
        if self.policy.path == "doubleword":
            from .ops.doubledouble import DD, DDComplex
            if not isinstance(fu, (DD, DDComplex)):
                fu = self.shard_complex_dd(fu)
        else:
            fu = self._coerce(fu, self.complex, self.complex_sharding())
        plan = self._plan(("ifftn", dealias), lambda: self.backward_fn(dealias))
        return plan(fu)


class R2C(_Pencil3D):
    """Real ↔ complex 3D pencil transform (reference: mpiFFT4py/pencil.py R2C,
    mount empty at build time — SURVEY.md §2.1 #4, §3.4)."""

    _is_r2c = True

    @property
    def _in_dtype(self):
        return self.float

    def _fft_last(self, u):
        return fc.rfft(u, axis=2)

    def _ifft_last(self, x, padded):
        n = int(self.M[2] if padded else self.N[2])
        return fc.irfft(x, n=n, axis=2).astype(self.float)

    def _trunc_last(self, x):
        return trunc_half_axis(x, 2, self.Nf)

    def _pad_last(self, x):
        return pad_half_axis(x, 2, self.Mf)

    # doubleword hooks
    def _fft_last_dd(self, u):
        from .ops import dd_fft as df
        return df.rfft_dd(u, axis=2)

    def _ifft_last_dd(self, x, padded):
        from .ops import dd_fft as df
        return df.irfft_dd(x, axis=2, n=int(self.M[2] if padded else self.N[2]))

    def _trunc_last_dd(self, x):
        from .utils import spectral_dd as sdd
        return sdd.trunc_half_axis_dd(x, 2, self.Nf)

    def _pad_last_dd(self, x):
        from .utils import spectral_dd as sdd
        return sdd.pad_half_axis_dd(x, 2, self.Mf)

    # padded planar-tier z hooks (trunc/pad + padsize³ folded into matrices)
    def _z_fwd_planar_padded(self, u):
        from .ops import pallas_fft3d as p3
        yr, yi = p3.rfft_last_planar(u, nf=self.Nf,
                                     scale=1.0 / self.padsize ** 3)
        return p3.fit_width(yr, yi, self.Nfp)

    def _z_bwd_planar_padded(self, pr, pi):
        from .ops import pallas_fft3d as p3
        W = p3._round_up(self.Nf, 128)
        pr, pi = p3.fit_width(pr[..., :self.Nf], pi[..., :self.Nf], W)
        u = p3.irfft_last_planar(pr, pi, int(self.M[2]), nf_in=self.Nf,
                                 scale=self.padsize ** 3)
        return u.astype(self.float)


class C2C(_Pencil3D):
    """Complex ↔ complex 3D pencil transform.

    Scope source: BASELINE.json:5 puts complex↔complex over BOTH
    decompositions in scope (reference mount empty; ``slab.C2C`` at
    slab.py is the distributed template — VERDICT r2 next-step 3).

    Both spaces are complex (N0, N1, N2); physical sharded
    P("p1", "p2", None), spectral (alignment "X") P(None, "p1", "p2") with
    the FULL last axis sharded by divisibility — no Nfp alignment padding,
    because the c2c fft layout stores negative frequencies in the upper
    half of the axis, so end-padding would land between +k and −k.
    Requires P2 | N2 ("X") or P1 | N2 ("Y").
    """

    _is_r2c = False

    @property
    def _in_dtype(self):
        return self.complex

    def _k2_chunk(self, nf, r, dtype):
        return local_wavenumber_full(int(self.N[2]), nf, r, dtype)

    def _fft_last(self, u):
        return fc.fft(u, axis=2)

    def _ifft_last(self, x, padded):
        return fc.ifft(x, axis=2)

    def _trunc_last(self, x):
        return trunc_full_axis(x, 2, int(self.N[2]))

    def _pad_last(self, x):
        return pad_full_axis(x, 2, int(self.M[2]))

    def _fix_nyq(self, x):
        return x  # full complex spectrum: no Hermitian constraint to repair

    def _fix_nyq_dd(self, x):
        return x

    def shard_real(self, u):
        """'Physical' space is complex for C2C."""
        from .utils.transfer import device_put as _dp
        return _dp(u, self.complex, NamedSharding(self.mesh, self.real_spec()))

    # doubleword hooks (complex physical space)
    def _fft_last_dd(self, u):
        from .ops import dd_fft as df
        return df.fft_dd(u, axis=2)

    def _ifft_last_dd(self, x, padded):
        from .ops import dd_fft as df
        return df.ifft_dd(x, axis=2)

    def _trunc_last_dd(self, x):
        from .utils import spectral_dd as sdd
        return sdd.trunc_full_axis_dd(x, 2, int(self.N[2]))

    def _pad_last_dd(self, x):
        from .utils import spectral_dd as sdd
        return sdd.pad_full_axis_dd(x, 2, int(self.M[2]))

    def shard_real_dd(self, u):
        from .ops.doubledouble import DDComplex
        d = DDComplex.from_c128(np.asarray(u, np.complex128))
        sh = NamedSharding(self.mesh, self.real_spec())
        return jax.tree.map(lambda v: jax.device_put(v, sh), d)

    # -- Pallas planar distributed tier (dense c2c z-lanes) --------------------

    def _z_kernel_ok(self, padded: bool = False) -> bool:
        from .ops import pallas_fft3d as p3
        return p3.supported_c2c_last(int(self.M[2] if padded else self.N[2]))

    def _z_fwd_planar(self, u):
        from .ops import pallas_fft3d as p3
        xr = jnp.real(u).astype(jnp.float32)
        xi = jnp.imag(u).astype(jnp.float32)
        return p3.fft_last_planar_c2c(xr, xi)

    def _z_bwd_planar(self, pr, pi):
        from .ops import pallas_fft3d as p3
        yr, yi = p3.fft_last_planar_c2c(pr, pi, inverse=True)
        return lax.complex(yr, yi)

    # padded planar-tier z hooks (full complex axis; explicit trunc/scale —
    # the fold-into-matrix trick is a half-axis/real-matmul property)
    def _z_trunc_planar(self, yr, yi):
        n2 = int(self.N[2])
        return trunc_full_axis(yr, 2, n2), trunc_full_axis(yi, 2, n2)

    def _z_fwd_planar_padded(self, u):
        yr, yi = self._z_fwd_planar(u)
        yr, yi = self._z_trunc_planar(yr, yi)
        s = np.float32(1.0 / self.padsize ** 3)
        return yr * s, yi * s

    def _z_bwd_planar_padded(self, pr, pi):
        from .ops import pallas_fft3d as p3
        M2 = int(self.M[2])
        pr = pad_full_axis(pr, 2, M2)
        pi = pad_full_axis(pi, 2, M2)
        yr, yi = p3.fft_last_planar_c2c(pr, pi, inverse=True)
        return lax.complex(yr, yi) * self.complex.type(self.padsize ** 3)

    def _packed_iface_ok(self, dealias) -> bool:
        return False  # packed-Hermitian layout is an R2C concept
