"""Hand-fused Pallas TPU kernels for the transport hot path.

The azimuthal van Leer sweep dominates the FARGO step: for each of the two
FARGO passes the XLA version makes ~8 HBM round-trips over the stacked
(K, NR, NAZ) quantity batch (slopes, upwind stars, fluxes, update as
separate fusion clusters split by the lane rolls). The fused kernel below
performs the complete sweep — density star, per-quantity specific values,
upwind interpolation, flux differencing, update — with ONE read and ONE
write of the batch per pass: rows are independent in the azimuthal sweep,
so the grid tiles the radial axis with no halo, and the azimuthal
neighbor accesses are in-register lane rolls.

Falls back to the pure-jnp implementation off-TPU (CPU tests run the jnp
path; a parity test pins the two implementations together).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift):
    """Lane-axis circular roll inside the kernel (azimuthal neighbors).
    pltpu.roll requires a non-negative shift."""
    return pltpu.roll(x, shift % x.shape[-1], axis=x.ndim - 1)


def _van_leer(a, b):
    prod = a * b
    denom = jnp.where(prod > 0.0, a + b, 1.0)
    return jnp.where(prod > 0.0, 2.0 * prod / denom, 0.0)


def _mc(a, b):
    def minmod(p, q):
        return jnp.where(p * q > 0.0,
                         jnp.where(jnp.abs(p) < jnp.abs(q), p, q), 0.0)
    return minmod(0.5 * (a + b), 2.0 * minmod(a, b))


def _theta_sweep_kernel(dt_ref, qs_ref, v_ref, rb_ref, coef_ref,
                        inv_surf_ref, out_ref, *, k_quant: int, dphi: float,
                        limiter: int):
    """One radial tile of the azimuthal sweep.

    qs_ref:  (K, T, NAZ) quantity batch; entry K-1 is the surface density
    v_ref:   (T, NAZ) transport velocity
    rb_ref:  (T, 1) cell-center radii
    coef_ref:(T, 1) (Rsup - Rinf)
    inv_surf_ref: (T, 1)
    """
    dt = dt_ref[0, 0]
    v = v_ref[:]
    rb = rb_ref[:]
    dxtheta = dphi * rb
    inv_dxtheta = 1.0 / dxtheta
    ksi = v * dt
    lim = _mc if limiter == 1 else _van_leer

    def star(q):
        """Upwind interface value of q at azimuthal interface j
        (between cells j-1 and j)."""
        qm = _roll(q, 1)
        dq = 0.5 * lim(_roll(q, -1) - q, q - qm) * inv_dxtheta
        up = qm + (dxtheta - ksi) * _roll(dq, 1)
        dn = q - (dxtheta + ksi) * dq
        return jnp.where(ksi > 0.0, up, dn)

    sig = qs_ref[k_quant - 1]
    dens_star = star(sig)
    inv_sig = 1.0 / sig
    coef = coef_ref[:] * dt
    base_flux = dens_star * v * coef          # (T, NAZ)
    for k in range(k_quant):
        if k == k_quant - 1:
            qstar = 1.0                        # work = sigma/sigma
            f = base_flux
        else:
            work = qs_ref[k] * inv_sig
            f = star(work) * base_flux
        out_ref[k] = qs_ref[k] + (f - _roll(f, -1)) * inv_surf_ref[:]


@functools.partial(jax.jit, static_argnames=("dphi", "limiter", "tile"))
def theta_sweep_pallas(qs, v, rb_col, coef_col, inv_surf_col, dt,
                       dphi: float, limiter: int, tile: int = 16):
    """Fused azimuthal van Leer sweep over the (K, NR, NAZ) batch."""
    k_quant, nr, naz = qs.shape
    grid = (nr // tile,)
    kernel = functools.partial(_theta_sweep_kernel, k_quant=k_quant,
                               dphi=dphi, limiter=limiter)
    dt_arr = jnp.reshape(jnp.asarray(dt, qs.dtype), (1, 1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k_quant, tile, naz), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, naz), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_quant, tile, naz), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
    )(dt_arr, qs, v, rb_col, coef_col, inv_surf_col)


def _shift_kernel(shift_ref, x_ref, o_ref):
    """Per-ring dynamic circular roll (the FARGO integer shift)."""
    tile = x_ref.shape[1]
    i = pl.program_id(0)

    def body(r, carry):
        s = shift_ref[i * tile + r]
        o_ref[:, r, :] = pltpu.roll(x_ref[:, r, :], s, axis=1)
        return carry

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("tile",))
def advect_shift_pallas(qs, nshift, tile: int = 16):
    """FARGO integer-cell azimuthal roll with per-ring dynamic shifts
    (reference src/TransportEuler.cpp:238-268 ``AdvectSHIFT``) as one fused
    read+write pass; Mosaic's dynamic lane rotate replaces the gather the
    reference's index arithmetic would imply."""
    k_quant, nr, naz = qs.shape
    shifts = jnp.mod(nshift, naz).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nr // tile,),
        in_specs=[
            pl.BlockSpec((nr,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((k_quant, tile, naz), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_quant, tile, naz), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _shift_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype))(shifts, qs)


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"
