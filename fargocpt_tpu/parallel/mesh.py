"""Multi-chip distribution: radial 1-D device mesh.

TPU-native replacement for the reference's MPI radial domain decomposition
(src/split.cpp:21-397, src/commbound.cpp:45-182): every (NR, NAZ) field is
sharded along the radial axis over a ``jax.sharding.Mesh``; the stencil
shifts inside the jitted step make XLA insert neighbor collective-permutes
over ICI (the halo exchange), the CFL min becomes a cross-shard reduce,
and the FARGO integer shift rides the unsharded azimuthal axis with zero
communication.

This module provides the mesh + sharding helpers; the step functions are
sharding-agnostic (they act on global-view arrays; GSPMD partitions them).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RADIAL_AXIS = "r"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the radial axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RADIAL_AXIS,))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """(NR, NAZ) arrays: radial axis sharded, azimuthal replicated-local."""
    return NamedSharding(mesh, P(RADIAL_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_fields(fields, mesh: Mesh):
    """Place a FieldState on the mesh, radial-sharded.

    v_rad has NR+1 rows, which cannot be evenly partitioned, so at the jit
    boundary it is replicated; GSPMD still computes on it shard-wise inside
    the step. (The explicit shard_map halo-exchange path will carry local
    face arrays instead.)"""
    sh = field_sharding(mesh)
    rep = replicated(mesh)
    n = mesh.devices.size

    def place(x):
        if x.ndim >= 2 and x.shape[0] % n == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, fields)


def shard_state(state, mesh: Mesh):
    """Place a full SystemState on the mesh: grid fields radial-sharded,
    body arrays and scalars replicated."""
    return shard_fields(state, mesh)


# backwards-compatible alias
shard_aux = shard_state
