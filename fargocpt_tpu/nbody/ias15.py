"""Adaptive 15th-order Gauss-Radau N-body integrator (IAS15).

Replaces the fixed-substep RK4 placeholder with the integrator class the
reference actually uses for its planetary system: REBOUND's IAS15
(reference src/nbody/planetary_system.cpp:35-64 ``init_rebound`` selects
REB_INTEGRATOR_IAS15 with exact_finish_time, :878 ``integrate``). The
algorithm is Rein & Spiegel (2015), MNRAS 446, 1424: a 7-node Gauss-Radau
predictor-corrector whose divided-difference coefficients ``g`` are
converted to polynomial coefficients ``b``, with an adaptive step from the
magnitude of the highest-order term b6 relative to the acceleration
(eps = 1e-9, the REBOUND default fargocpt keeps).

This is an original JAX implementation, written array-at-a-time over the
(N,2) planar body state inside ``lax.while_loop``s so a whole hydro-step
N-body advance stays on device. Design differences from REBOUND, chosen
deliberately:

  * every ``integrate`` call starts from fresh b/e coefficient seeds and
    an internal trial step equal to the full requested interval (IAS15
    shrinks it via rejection where needed). This makes each call a pure
    deterministic function of (state, dt) — no hidden integrator memory —
    which keeps checkpoint/restart bitwise reproducible without
    serializing REBOUND-style internal buffers.
  * compensated (Kahan) summation is used for the position/velocity
    accumulators across substeps; the b/g coefficient updates use plain
    f64 (the 1e-16-relative corrector tolerance dominates).

The Gauss-Radau node constants (h, rr, c, d) are the published values
from Everhart (1985) / Rein & Spiegel (2015) — any implementation of this
scheme contains the same numbers.

Validated against 2-body Kepler ellipses at e=0.9 over hundreds of
periods (tests/test_ias15.py): energy drift < 1e-12, position error vs
the analytic orbit ~1e-10 per 100 periods.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Gauss-Radau spacings (nodes of the 8-point Radau IIA quadrature on [0,1])
H_NODES = np.array([
    0.0,
    0.0562625605369221464656521910318,
    0.180240691736892364987579942780,
    0.352624717113169637373907769648,
    0.547153626330555383001448554766,
    0.734210177215410531523210605558,
    0.885320946839095768090359771030,
    0.977520613561287501891174488626,
])

# rr[j] = h[n] - h[m] pair differences in the divided-difference order
_RR = np.zeros(28)
_k = 0
for _n in range(1, 8):
    for _m in range(_n):
        _RR[_k] = H_NODES[_n] - H_NODES[_m]
        _k += 1

# c: conversion from divided differences g to polynomial coefficients b
# (coefficients of prod_{m<n}(x - h_m) expanded); d is its inverse.
# Built exactly as in Everhart's recurrence.
_C = np.zeros((8, 8))
_D = np.zeros((8, 8))
for _i in range(8):
    _C[_i, _i] = 1.0
    _D[_i, _i] = 1.0
for _i in range(1, 8):
    _C[_i, 0] = -H_NODES[_i] * _C[_i - 1, 0]
    _D[_i, 0] = H_NODES[1] * _D[_i - 1, 0]
    for _j in range(1, _i):
        _C[_i, _j] = _C[_i - 1, _j - 1] - H_NODES[_i] * _C[_i - 1, _j]
        _D[_i, _j] = _D[_i - 1, _j - 1] + H_NODES[_j + 1] * _D[_i - 1, _j]

SAFETY = 0.25         # max shrink per rejection / max growth factor 1/SAFETY
EPS_DEFAULT = 1e-9    # REBOUND ri_ias15.epsilon default
MAX_PC_ITER = 12      # predictor-corrector iteration cap
MAX_SUBSTEPS = 4096   # backstop against pathological shrink loops

# position-series integration weights: x gets dt^2 * b_j / XW[j]
_XW = np.array([6.0, 12.0, 20.0, 30.0, 42.0, 56.0, 72.0])
# velocity-series weights: v gets dt * b_j / VW[j]
_VW = np.array([2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])


def _mutual_accel(x, y, m, G):
    """Pairwise planar gravitational accelerations, (N,) each."""
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    d2 = dx * dx + dy * dy
    inv_d3 = jnp.where(d2 > 0.0, d2 ** -1.5, 0.0)
    ax = G * jnp.sum(m[None, :] * dx * inv_d3, axis=1)
    ay = G * jnp.sum(m[None, :] * dy * inv_d3, axis=1)
    return ax, ay


def _predict_pos(x0, v0, a0, b, hn, dt):
    """Position at Radau node hn from the current b series (the nested
    Horner form of the twice-integrated acceleration polynomial)."""
    s = b[6] * 7.0 * hn / 9.0 + b[5]
    s = s * 3.0 * hn / 4.0 + b[4]
    s = s * 5.0 * hn / 7.0 + b[3]
    s = s * 2.0 * hn / 3.0 + b[2]
    s = s * 3.0 * hn / 5.0 + b[1]
    s = s * hn / 2.0 + b[0]
    s = s * hn / 3.0 + a0
    return (s * dt * hn / 2.0 + v0) * dt * hn + x0


def _g_from_accel(n, at, a0, g):
    """Divided difference g_{n-1} from the acceleration at node n."""
    gk = at - a0
    base = (n - 1) * n // 2    # start of row n-1 in the rr triangle
    val = gk / _RR[base]
    for m in range(1, n):
        val = (val - g[m - 1]) / _RR[base + m]
    return val


def _pc_sweep(x0, v0, a0, b, g, dt, m, G):
    """One corrector sweep over all 7 nodes; returns (b, g, db6max, atmax)."""
    n_half = x0.shape[0] // 2
    db6max = jnp.zeros((), x0.dtype)
    atmax = jnp.zeros((), x0.dtype)
    for n in range(1, 8):
        hn = H_NODES[n]
        xn = _predict_pos(x0, v0, a0, b, hn, dt)
        axn, ayn = _mutual_accel(xn[:n_half], xn[n_half:], m, G)
        at = jnp.concatenate([axn, ayn])
        g_new = _g_from_accel(n, at, a0, g)
        delta = g_new - g[n - 1]
        g = g.at[n - 1].set(g_new)
        # b_j += delta * C[n-1, j] for j < n-1; b_{n-1} += delta
        for j in range(n - 1):
            b = b.at[j].add(delta * _C[n - 1, j])
        b = b.at[n - 1].add(delta)
        if n == 7:
            db6max = jnp.max(jnp.abs(delta))
            atmax = jnp.max(jnp.abs(at))
    return b, g, db6max, atmax


def _step_trial(x0, v0, csx, csv, a0, b, e, dt, m, G, epsilon):
    """One IAS15 trial step of size dt. Returns
    (x1, v1, csx1, csv1, b, e, dt_new, accept)."""
    dtype = x0.dtype
    # seed g from b (inverse conversion via the D matrix) so a predicted b
    # gives a warm corrector start
    g = jnp.stack([sum(b[j] * _D[j, i] for j in range(i, 7))
                   for i in range(7)])

    # 1e-16 for f64 (the REBOUND constant ~ eps/2); scaled for f32 runs
    pc_tol = 0.45 * jnp.finfo(dtype).eps

    def pc_cond(c):
        _b, _g, err, err_last, it = c
        return ((err >= pc_tol) & (it < MAX_PC_ITER)
                & ((it <= 2) | (err_last > err)))

    def pc_body(c):
        _b, _g, err, err_last, it = c
        _b, _g, db6, atm = _pc_sweep(x0, v0, a0, _b, _g, dt, m, G)
        new_err = jnp.where(atm > 0.0, db6 / atm, jnp.zeros((), dtype))
        return (_b, _g, new_err, err, it + 1)

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    b, g, _, _, _ = jax.lax.while_loop(
        pc_cond, pc_body, (b, g, big, big, jnp.zeros((), jnp.int32)))

    # final positions/velocities over dt (compensated summation)
    def add_cs(val, cs, inc):
        y = inc - cs
        t = val + y
        cs = (t - val) - y
        return t, cs

    x1, csx1 = x0, csx
    v1, csv1 = v0, csv
    dt2 = dt * dt
    for j in range(6, -1, -1):
        x1, csx1 = add_cs(x1, csx1, b[j] / _XW[j] * dt2)
    x1, csx1 = add_cs(x1, csx1, a0 / 2.0 * dt2)
    x1, csx1 = add_cs(x1, csx1, v0 * dt)
    for j in range(6, -1, -1):
        v1, csv1 = add_cs(v1, csv1, b[j] / _VW[j] * dt)
    v1, csv1 = add_cs(v1, csv1, a0 * dt)

    # error estimate from the highest-order series term (epsilon_global=1
    # semantics incl. the slowly-varying-acceleration filter)
    n_half = x0.shape[0] // 2
    a_end_x, a_end_y = _mutual_accel(x1[:n_half], x1[n_half:], m, G)
    at = jnp.concatenate([a_end_x, a_end_y])
    v2 = v1[:n_half] ** 2 + v1[n_half:] ** 2
    x2 = x1[:n_half] ** 2 + x1[n_half:] ** 2
    active = jnp.abs(v2 * dt2 / jnp.where(x2 > 0, x2, 1.0)) >= 1e-16
    act2 = jnp.concatenate([active, active])
    maxak = jnp.max(jnp.where(act2, jnp.abs(at), 0.0))
    maxb6 = jnp.max(jnp.where(act2, jnp.abs(b[6]), 0.0))
    err = jnp.where(maxak > 0.0, maxb6 / maxak, jnp.zeros((), dtype))

    dt_new = jnp.where(
        (err > 0.0) & jnp.isfinite(err),
        (epsilon / err) ** (1.0 / 7.0) * dt,
        dt / SAFETY)
    accept = jnp.abs(dt_new / dt) >= SAFETY
    # accepted steps may not grow the next step too fast
    dt_next = jnp.where(accept, jnp.minimum(dt_new, dt / SAFETY), dt_new)

    # predict b (and e) forward to the next trial size
    ratio = dt_next / dt
    q = jnp.stack([ratio ** (k + 1) for k in range(7)])
    pascal = np.array([
        [1., 2., 3., 4., 5., 6., 7.],
        [0., 1., 3., 6., 10., 15., 21.],
        [0., 0., 1., 4., 10., 20., 35.],
        [0., 0., 0., 1., 5., 15., 35.],
        [0., 0., 0., 0., 1., 6., 21.],
        [0., 0., 0., 0., 0., 1., 7.],
        [0., 0., 0., 0., 0., 0., 1.],
    ])
    be = b - e
    e_next = q[:, None] * jnp.einsum("jk,k...->j...", jnp.asarray(
        pascal, b.dtype), b)
    b_next = e_next + be
    # a very large growth invalidates the polynomial extrapolation
    wipe = ratio > 20.0
    e_next = jnp.where(wipe, jnp.zeros_like(e_next), e_next)
    b_next = jnp.where(wipe, jnp.zeros_like(b_next), b_next)

    return x1, v1, csx1, csv1, b_next, e_next, dt_next, accept


def integrate_ias15(x, y, vx, vy, m, G, dt, epsilon=EPS_DEFAULT):
    """Advance the planar N-body system by exactly ``dt`` (exact finish
    time, like the reference's reb_integrate call) with adaptive IAS15
    substeps. Returns (x, y, vx, vy)."""
    dtype = x.dtype
    n = x.shape[0]
    q0 = jnp.concatenate([x, y])
    p0 = jnp.concatenate([vx, vy])
    zeros7 = jnp.zeros((7,) + q0.shape, dtype)
    dt = jnp.asarray(dt, dtype)
    eps_t = 1e-14 * jnp.abs(dt)

    def cond(c):
        (q, p, csq, csp, b, e, t, dt_int, k) = c
        return (t < dt - eps_t) & (k < MAX_SUBSTEPS)

    def body(c):
        (q, p, csq, csp, b, e, t, dt_int, k) = c
        remaining = dt - t
        step_dt = jnp.minimum(dt_int, remaining)
        ax, ay = _mutual_accel(q[:n], q[n:], m, G)
        a0 = jnp.concatenate([ax, ay])
        (q1, p1, csq1, csp1, b1, e1, dt_next, accept) = _step_trial(
            q, p, csq, csp, a0, b, e, step_dt, m, G, epsilon)
        q = jnp.where(accept, q1, q)
        p = jnp.where(accept, p1, p)
        csq = jnp.where(accept, csq1, csq)
        csp = jnp.where(accept, csp1, csp)
        t = jnp.where(accept, t + step_dt, t)
        return (q, p, csq, csp, b1, e1, t,
                jnp.maximum(dt_next, 1e-12 * jnp.abs(dt)), k + 1)

    init = (q0, p0, jnp.zeros_like(q0), jnp.zeros_like(p0),
            zeros7, zeros7, jnp.zeros((), dtype), dt,
            jnp.zeros((), jnp.int32))
    q, p, _, _, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return q[:n], q[n:], p[:n], p[n:]
