"""Opacity laws.

Re-derivation of reference src/opacity.cpp: Lin & Papaloizou (1985) and
Bell & Lin (1994) piecewise power-law fits with smoothed transitions, plus
constant and kappa0*T^2 laws. Vectorized with jnp.where over the branch
structure (all branches evaluated — branch-free on the VPU).

Transcendental budget: the fits are evaluated once per cell on every
full-grid call (thermal cooling + FLD coefficients — 3 calls per PDS70
step), so the naive form's ~8 non-integer ``pow`` per cell (2
transcendentals each) dominated the cost.  All regime CONDITIONS compare
in log space (``lnT > c + p * lnrho`` — no pow at all), the remaining
fractional powers share one ``log(rho)`` through ``exp(a * lnrho)``, and
``x ** 0.25`` is two square roots.  Identical math, ~5 transcendentals
per cell.  lnrho = -inf at rho = 0 degrades exactly like the pow form
(exp(-inf) = 0, comparisons against -inf keep the original branch).

Inputs/outputs in code units; the table fits are in cgs internally.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..params import Physics


def _q25(x):
    """x ** 0.25 for x >= 0 as two sqrts (cheaper than pow on the VPU)."""
    return jnp.sqrt(jnp.sqrt(x))


def _sq(x):
    return x * x


def _lin_cgs(rho, T):
    """Lin & Papaloizou 1985 (reference src/opacity.cpp:37-133)."""
    power1, power2, power3 = 4.44444444e-2, 2.381e-2, 2.267e-1
    t234, t456, t678 = 1.6e3, 5.7e3, 2.28e6
    ak1, ak2, ak3 = 2.0e-4, 2.0e16, 5.0e-3
    bk3, bk4, bk5, bk6, bk7, bk8 = 50.0, 2.0e-2, 2.0e4, 1.0e4, 1.5e10, 0.348

    lnT = jnp.log(T)
    lnr = jnp.log(rho)

    # --- low-temperature branch (regions 1-3) ---
    t2 = T * T
    t4 = t2 * t2
    t8 = t4 * t4
    t10 = t8 * t2
    o1 = ak1 * t2
    o2 = ak2 * T / t8
    o3l = ak3 * T
    o1an = o1 * o1
    o2an = o2 * o2
    k_low = _q25(
        _sq(o1an * o2an / (o1an + o2an))
        + _sq(_sq(o3l / (1.0 + 1.0e22 / t10))))

    # --- high-temperature branches ---
    ts4 = 1.0e-4 * T
    rho13 = jnp.exp(lnr * (1.0 / 3.0))
    rho23 = rho13 * rho13
    ts42 = ts4 * ts4
    ts44 = ts42 * ts42
    ts48 = ts44 * ts44

    # regions 3-5
    o3 = bk3 * ts4
    o4 = bk4 * rho23 / (ts48 * ts4)
    o5 = bk5 * rho23 * ts42 * ts4
    o4an = _sq(_sq(o4))
    o3an = _sq(_sq(o3))
    k_345 = _q25((o4an * o3an / (o4an + o3an))
                 + _sq(_sq(o5 / (1.0 + 6.561e-5 / ts48))))

    # regions 5-7
    o6 = bk6 * rho13 * ts48 * ts42
    o7 = bk7 * rho / (ts42 * jnp.sqrt(ts4))
    o6an = o6 * o6
    o7an = o7 * o7
    w = ts4 / (1.1 * jnp.exp(0.04762 * lnr))
    w2 = w * w
    w10 = _sq(_sq(w2)) * w2
    k_567 = _q25(
        _sq(o6an * o7an / (o6an + o7an))
        + _sq(_sq(o5 / (1.0 + w10))))

    # regions 7-8
    o8 = bk8
    o8an = o8 * o8
    k_78 = _q25(o7an * o7an + o8an * o8an)

    k_high2 = jnp.where((lnT < math.log(t678) + power3 * lnr)
                        | (rho <= 1e-10), k_567, k_78)
    k_high = jnp.where(lnT > math.log(t456) + power2 * lnr, k_high2, k_345)
    return jnp.where(lnT > math.log(t234) + power1 * lnr, k_high, k_low)


def _bell_cgs(rho, T):
    """Bell & Lin 1994 (reference src/opacity.cpp:186-296)."""
    power1, power2, power3 = 2.8369e-2, 1.1464e-2, 2.2667e-1
    t234, t456, t678 = 1.46e3, 4.51e3, 2.37e6
    ak1, ak2, ak3 = 2.0e-4, 2.0e16, 0.1
    bk3, bk4, bk5, bk6, bk7, bk8 = 10.0, 2.0e-15, 1e4, 1e4, 1.5e10, 0.348

    T = jnp.where(T < 1.0, 10.0, T)
    lnT = jnp.log(T)
    lnr = jnp.log(rho)

    t2 = T * T
    t4 = t2 * t2
    t8 = t4 * t4
    t10 = t8 * t2
    o1 = ak1 * t2
    o2 = ak2 * T / t8
    o3l = ak3 * jnp.sqrt(T)
    o1an = o1 * o1
    o2an = o2 * o2
    k_low = _q25(_sq(o1an * o2an / (o1an + o2an))
                 + _sq(_sq(o3l / (1.0 + 1.0e22 / t10))))

    ts4 = 1.0e-4 * T
    rho13 = jnp.exp(lnr * (1.0 / 3.0))
    rho23 = rho13 * rho13
    ts42 = ts4 * ts4
    ts44 = ts42 * ts42
    ts48 = ts44 * ts44

    o3 = bk3 * jnp.sqrt(ts4)
    o4 = bk4 * rho / (ts48 * ts48 * ts48)
    o5 = bk5 * rho23 * ts42 * ts4
    o4an = _sq(_sq(o4))
    o3an = _sq(_sq(o3))
    k_345 = _q25((o4an * o3an / (o4an + o3an))
                 + _sq(_sq(o5 / (1.0 + 6.561e-5 / ts48 * 1e2 * rho23))))

    o6 = bk6 * rho13 * ts48 * ts42
    o7 = bk7 * rho / (ts42 * jnp.sqrt(ts4))
    o6an = o6 * o6
    o7an = o7 * o7
    w = ts4 / (1.1 * jnp.exp(0.04762 * lnr))
    w2 = w * w
    w10 = _sq(_sq(w2)) * w2
    k_567 = _q25(_sq(o6an * o7an / (o6an + o7an))
                 + _sq(_sq(o5 / (1.0 + w10))))
    o8 = bk8
    o8an = o8 * o8
    k_78 = _q25(o7an * o7an + o8an * o8an)

    k_high2 = jnp.where((lnT < math.log(t678) + power3 * lnr)
                        | ((rho <= 1e10) & (T < 1e4)), k_567, k_78)
    k_high = jnp.where(lnT > math.log(t456) + power2 * lnr, k_high2, k_345)
    return jnp.where(lnT > math.log(t234) + power1 * lnr, k_high, k_low)


def opacity(phys: Physics, units, rho, T):
    """kappa(rho, T) in code units (reference src/opacity.cpp:8-32)."""
    mode = phys.opacity_mode
    if mode.startswith("const"):
        kappa = phys.kappa_const
    elif mode == "simple":
        t_cgs = T * units.temperature
        kappa = phys.kappa_const * t_cgs ** 2
    else:
        rho_cgs = rho * units.density
        t_cgs = T * units.temperature
        fn = _bell_cgs if mode == "bell" else _lin_cgs
        kappa = fn(rho_cgs, t_cgs) / units.opacity
    return phys.kappa_factor * kappa
