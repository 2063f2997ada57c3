"""Closed-form solutions used by the physics-validation tests."""

from __future__ import annotations

import numpy as np
from scipy.optimize import brentq
from scipy.special import iv as bessel_iv


class SodSolution:
    """Exact Riemann solution of the Sod shock tube (standard solver,
    e.g. Toro ch. 4). Matches the reference's tabulated
    test/shockTube/analytic_shock.dat."""

    def __init__(self, gamma=1.4, rho_l=1.0, p_l=1.0, u_l=0.0,
                 rho_r=0.125, p_r=0.1, u_r=0.0):
        g = gamma
        c_l = np.sqrt(g * p_l / rho_l)
        c_r = np.sqrt(g * p_r / rho_r)

        def f(p, pk, rhok, ck):
            if p > pk:  # shock branch
                A = 2.0 / ((g + 1) * rhok)
                B = (g - 1) / (g + 1) * pk
                return (p - pk) * np.sqrt(A / (p + B))
            return 2 * ck / (g - 1) * ((p / pk) ** ((g - 1) / (2 * g)) - 1)

        p_star = brentq(
            lambda p: f(p, p_l, rho_l, c_l) + f(p, p_r, rho_r, c_r)
            + (u_r - u_l), 1e-8, 10.0 * max(p_l, p_r))
        u_star = 0.5 * (u_l + u_r) + \
            0.5 * (f(p_star, p_r, rho_r, c_r) - f(p_star, p_l, rho_l, c_l))
        self.gamma = g
        self.left = (rho_l, p_l, u_l, c_l)
        self.right = (rho_r, p_r, u_r, c_r)
        self.p_star = p_star
        self.u_star = u_star
        self.rho_star_l = rho_l * (p_star / p_l) ** (1 / g)
        B = (g - 1) / (g + 1)
        self.rho_star_r = rho_r * (p_star / p_r + B) / (B * p_star / p_r + 1)
        self.c_star_l = np.sqrt(g * p_star / self.rho_star_l)
        self.shock_speed = u_r + c_r * np.sqrt(
            (g + 1) / (2 * g) * p_star / p_r + (g - 1) / (2 * g))

    def __call__(self, x, t, x0=0.0):
        """Returns (rho, u, p) arrays at positions x, time t."""
        g = self.gamma
        rho_l, p_l, u_l, c_l = self.left
        rho_r, p_r, u_r, _ = self.right
        xi = (np.asarray(x) - x0) / t
        head = u_l - c_l
        tail = self.u_star - self.c_star_l

        u_fan = 2 / (g + 1) * (c_l + (g - 1) / 2 * u_l + xi)
        c_fan = c_l - (g - 1) / 2 * (u_fan - u_l)
        rho_fan = rho_l * (c_fan / c_l) ** (2 / (g - 1))
        p_fan = p_l * (c_fan / c_l) ** (2 * g / (g - 1))

        rho = np.select(
            [xi < head, xi < tail, xi < self.u_star, xi < self.shock_speed],
            [rho_l, rho_fan, self.rho_star_l, self.rho_star_r], rho_r)
        u = np.select(
            [xi < head, xi < tail, xi < self.shock_speed],
            [u_l, u_fan, self.u_star], u_r)
        p = np.select(
            [xi < head, xi < tail, xi < self.shock_speed],
            [p_l, p_fan, self.p_star], p_r)
        return rho, u, p


def spreading_ring_sigma(r, t, nu, disk_mass=1.0, r0=1.0, tau0=0.016):
    """Lynden-Bell & Pringle / Speith & Kley 2003 viscous ring."""
    x = np.asarray(r) / r0
    tau = 12.0 * nu * t / r0 ** 2 + tau0
    I = bessel_iv(0.25, 2.0 * x / tau)
    return disk_mass / (np.pi * r0 ** 2) / tau / x ** 0.25 * I \
        * np.exp(-(1.0 + x ** 2) / tau)
