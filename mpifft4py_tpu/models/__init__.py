"""Consumer models: pseudo-spectral DNS solvers built on the transform classes
(the spectralDNS usage pattern — SURVEY.md §3.5).

Lazy re-exports (keeps bare ``import mpifft4py_tpu`` light):
``NavierStokes3D``, ``NavierStokes2D``, ``VorticityVelocity3D``, ``MHD3D``,
``Boussinesq3D``, ``INTEGRATORS``.
"""


def __getattr__(name):
    if name in ("NavierStokes3D", "INTEGRATORS", "SpectralSolver"):
        from . import navier_stokes as m
        return getattr(m, name)
    if name == "Boussinesq3D":
        from .boussinesq import Boussinesq3D
        return Boussinesq3D
    if name == "NavierStokes2D":
        from .navier_stokes_2d import NavierStokes2D
        return NavierStokes2D
    if name == "VorticityVelocity3D":
        from .vv import VorticityVelocity3D
        return VorticityVelocity3D
    if name == "MHD3D":
        from .mhd import MHD3D
        return MHD3D
    raise AttributeError(name)
