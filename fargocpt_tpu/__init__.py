"""fargocpt_tpu — TPU-native protoplanetary-disk simulation framework.

A brand-new JAX/XLA implementation of the capabilities of FargoCPT
(2-D polar-grid disk hydrodynamics with FARGO orbital advection, N-body
coupling, viscosity, energy equation, self-gravity, FLD radiative
transfer, Lagrangian dust), designed TPU-first: state is a pytree of
arrays, a time step is one fused jitted function, and multi-chip scaling
uses a radial `jax.sharding.Mesh` with collective halo exchange instead of
MPI.

Physics fidelity is gated by ports of the reference's analytic test suite
(see tests/).
"""

__version__ = "0.1.0"

import sys as _sys

# Lowering the Pallas kernels nested inside jit(while_loop(step)) recurses
# deeper than CPython's default 1000-frame limit (JAX traces/lowers jaxprs
# recursively); raise it once here.
if _sys.getrecursionlimit() < 100000:
    _sys.setrecursionlimit(100000)

from . import config, constants, grid, params, state, units  # noqa: F401


def enable_x64():
    """Enable float64 (required for physics-fidelity tests; TPU benchmarks
    typically run float32)."""
    import jax
    jax.config.update("jax_enable_x64", True)
