"""Mesh construction, collective transposes, and pipelined overlap."""

from .mesh import slab_mesh, pencil_mesh, mesh_size, AXIS, AXIS1, AXIS2  # noqa: F401
