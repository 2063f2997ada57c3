"""Matmul-based 2-D real DFT for backends without an FFT lowering.

The axon TPU backend has NO FFT implementation at all — every
``jnp.fft.*`` executable fails with ``UNIMPLEMENTED: TPU backend error``
(hardware-probed 2026-08-18: 1-D/2-D, f32/c64, any axis, any length).
Self-gravity (ops/selfgravity.py) is the only FFT consumer, so its
convolution is re-expressed the TPU-native way: a DFT is a matrix
multiply, and moderate transform sizes (2048 x 3072 at the flagship
grid) map straight onto the MXU as a handful of large real matmuls.
This is the classic TPU formulation (systolic-array FFTs are matmul
DFTs); no complex arrays are materialised — spectra are carried as
(real, imag) pairs, which also sidesteps the backend's fragile complex
support (complex128 device_puts hang the axon tunnel, see CLAUDE.md).

Layout-compatible with ``np.fft.rfft2`` on a real (R, N) array:
forward returns the (R, N//2 + 1) half spectrum (full DFT along axis 0,
real-to-half DFT along axis -1); ``inverse`` matches
``np.fft.irfft2(..., s=(R, N))``.

Cost at the flagship doubled grid (R=2048, N=3072, K=1537): the four
transforms of one self-gravity evaluation are ~360 GFLOP of f32 matmul
— a few ms on a v5e MXU, vs a hydro step of ~2 ms. ``precision``
defaults to HIGHEST (6-pass bf16 ~ f32-exact) because the convolution
kernels have strong cancellation near u=0, theta=0.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _twiddles(n: int):
    """cos/sin tables cos(2 pi j k / n), sin(2 pi j k / n) in f64."""
    jk = np.outer(np.arange(n), np.arange(n))
    ang = 2.0 * np.pi * (jk % n) / n
    return np.cos(ang), np.sin(ang)


class RFFT2Plan:
    """Precomputed DFT matrices for rfft2/irfft2 on a fixed (R, N) grid."""

    def __init__(self, nrows: int, ncols: int, dtype=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST):
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.kcols = self.ncols // 2 + 1
        self.precision = precision
        R, N, K = self.nrows, self.ncols, self.kcols

        # azimuth (last axis): real -> half spectrum, W = exp(-2 pi i nk/N)
        ca, sa = _twiddles(N)
        self.ca = jnp.asarray(ca[:, :K], dtype)            # (N, K) cos
        self.sa = jnp.asarray(-sa[:, :K], dtype)           # (N, K) -sin
        # azimuth inverse: half spectrum -> real, with hermitian weights
        c = np.full(K, 2.0)
        c[0] = 1.0
        if N % 2 == 0:
            c[K - 1] = 1.0
        self.ia = jnp.asarray((c[:, None] * ca[:K, :]) / N, dtype)   # (K, N)
        self.ib = jnp.asarray((-c[:, None] * sa[:K, :]) / N, dtype)  # (K, N)
        # radius (axis 0): full complex DFT, W = cos - i sin
        cr, sr = _twiddles(R)
        self.cr = jnp.asarray(cr, dtype)                   # (R, R)
        self.sr = jnp.asarray(sr, dtype)                   # (R, R)

    def _dot(self, a, b):
        return jnp.dot(a, b, precision=self.precision)

    def forward(self, x):
        """rfft2 of a real (R0, N) array -> (re, im) each (R, K).

        R0 = x.shape[0] may be SMALLER than the plan's R: the remaining
        rows are treated as zeros without materialising them (the
        self-gravity convolution zero-pads NR data rows to 2NR; the
        padded half contributes nothing to the row-DFT matmul, so the
        twiddle matrices are column-sliced instead — half the FLOPs)."""
        r0 = x.shape[0]
        fr = self._dot(x, self.ca)                          # (R0, K)
        fi = self._dot(x, self.sa)
        gr = self._dot(self.cr[:, :r0], fr) + self._dot(self.sr[:, :r0], fi)
        gi = self._dot(self.cr[:, :r0], fi) - self._dot(self.sr[:, :r0], fr)
        return gr, gi

    def inverse(self, gr, gi, rows: int | None = None):
        """irfft2 of an (R, K) half spectrum -> real (rows, N).

        ``rows`` (default R) returns only the FIRST ``rows`` output rows
        — the self-gravity convolution discards the padded bottom half,
        so the inverse row-DFT matmul is row-sliced (half the FLOPs)."""
        r = self.nrows if rows is None else rows
        inv_r = 1.0 / self.nrows
        fr = (self._dot(self.cr[:r], gr) - self._dot(self.sr[:r], gi)) \
            * inv_r
        fi = (self._dot(self.cr[:r], gi) + self._dot(self.sr[:r], gr)) \
            * inv_r
        return self._dot(fr, self.ia) + self._dot(fi, self.ib)

    @staticmethod
    def cmul(ar, ai, br, bi):
        """Elementwise complex multiply on (re, im) pairs."""
        return ar * br - ai * bi, ar * bi + ai * br
