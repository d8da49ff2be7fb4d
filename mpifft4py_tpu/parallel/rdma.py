"""Pallas remote-DMA all-to-all transpose — the native ICI comm tier.

``lax.all_to_all`` leaves scheduling to XLA; this implements the slab/pencil
transpose directly as one Pallas kernel per array: every device posts P
async remote copies (one block per peer, straight HBM→HBM over ICI) and
waits on per-sender DMA semaphores.  On a real pod this is the building
block for software-pipelined transpose/compute overlap at DMA granularity;
on the 8-device CPU mesh it runs under the Pallas TPU interpreter
(``pltpu.InterpretParams``) with real cross-device semantics, which is how
the correctness tests drive it (tests/test_rdma.py).

Select with ``communication="rdma"`` on any transform class.  float32-pair
(planar) and float32/float64 arrays only — complex never reaches the
collective on the MXU distributed pipelines (planar re/im pairs), and the
XLA complex tier keeps ``lax.all_to_all``.

Semantics (per device, SPMD):

    block d of my input  --RDMA-->  slot ``my`` of device d's output
    barrier(collective) ; start all ; wait sends ; wait per-sender receives

Layout mirrors ``lax.all_to_all(split_axis, concat_axis, tiled=True)``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rdma_all_to_all", "rdma_supported"]


def rdma_supported(x) -> bool:
    return x.dtype in (jnp.float32, jnp.float64, jnp.bfloat16, jnp.int32)


def _a2a_kernel(P, axis_name, mesh_axes, split_axis, concat_axis,
                x_ref, o_ref, send_sem, recv_sem):
    my = lax.axis_index(axis_name).astype(jnp.int32)

    def dev_id(d):
        # MESH device ids carry ONE coordinate per mesh axis: the transpose
        # axis gets the peer index, every other axis keeps this device's own
        # coordinate (pencil's P1×P2 mesh addresses peers within one group).
        return tuple(jnp.int32(d) if name == axis_name
                     else lax.axis_index(name).astype(jnp.int32)
                     for name in mesh_axes)

    # global barrier: no device may post RDMAs before every peer has entered
    # the kernel (its output buffer must exist / be quiescent)
    barrier = pltpu.get_barrier_semaphore()
    for d in range(P):
        pltpu.semaphore_signal(barrier, 1, device_id=dev_id(d),
                               device_id_type=pltpu.DeviceIdType.MESH)
    pltpu.semaphore_wait(barrier, P)

    c_split = x_ref.shape[split_axis] // P
    c_concat = o_ref.shape[concat_axis] // P

    def src_slice(d):
        idx = [slice(None)] * len(x_ref.shape)
        idx[split_axis] = pl.ds(d * c_split, c_split)
        return x_ref.at[tuple(idx)]

    def dst_slice(s):
        idx = [slice(None)] * len(o_ref.shape)
        idx[concat_axis] = pl.ds(s * c_concat, c_concat)
        return o_ref.at[tuple(idx)]

    copies = []
    for d in range(P):
        # send my block d into peer d's slot `my`.  The receiver-side
        # semaphore slot is the RECEIVER's own index (every sender's loop
        # index for receiver d is d), so on this device all P incoming
        # copies signal recv_sem[my] — awaited below via the self
        # descriptor, once per expected copy (equal byte counts).
        rdma = pltpu.make_async_remote_copy(
            src_ref=src_slice(d), dst_ref=dst_slice(my),
            send_sem=send_sem.at[d], recv_sem=recv_sem.at[d],
            device_id=dev_id(d),
            device_id_type=pltpu.DeviceIdType.MESH)
        rdma.start()
        copies.append(rdma)
    for rdma in copies:
        rdma.wait_send()
    self_wait = pltpu.make_async_remote_copy(
        src_ref=src_slice(0), dst_ref=dst_slice(my),
        send_sem=send_sem.at[0], recv_sem=recv_sem.at[my],
        device_id=dev_id(my), device_id_type=pltpu.DeviceIdType.MESH)
    for _ in range(P):
        self_wait.wait_recv()


_collective_counter = [0]


def _next_collective_id() -> int:
    """Trace-time unique collective id (16..79): two rdma calls traced into
    the SAME program (planar re/im leaves, pencil's two stages) must not
    share barrier semaphores; sequential programs may reuse ids freely."""
    _collective_counter[0] = (_collective_counter[0] + 1) % 64
    return 16 + _collective_counter[0]


def rdma_all_to_all(x, axis_name: str, split_axis: int, concat_axis: int,
                    group_size: int, *, mesh_axes=None, collective_id=None,
                    interpret: bool = False):
    """Drop-in for ``lax.all_to_all(..., tiled=True)`` over remote DMA.

    Must be called inside ``shard_map`` over ``axis_name``.  ``mesh_axes`` is
    the mesh's full ordered axis-name tuple (defaults to ``(axis_name,)``,
    i.e. a 1D mesh) — MESH device ids need one coordinate per axis.
    ``interpret`` runs the Pallas TPU interpreter (CPU-mesh tests)."""
    P = int(group_size)
    assert x.shape[split_axis] % P == 0, (x.shape, split_axis, P)
    if mesh_axes is None:
        mesh_axes = (axis_name,)
    if collective_id is None:
        collective_id = _next_collective_id()
    out_shape = list(x.shape)
    out_shape[split_axis] //= P
    out_shape[concat_axis] *= P
    kernel = functools.partial(_a2a_kernel, P, axis_name, tuple(mesh_axes),
                               split_axis, concat_axis)
    kw = dict(interpret=pltpu.InterpretParams()) if interpret else {}
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(tuple(out_shape), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((P,)),
                        pltpu.SemaphoreType.DMA((P,))],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        **kw,
    )(x)
