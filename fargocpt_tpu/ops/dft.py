"""Matmul-based 2-D real DFT for backends without an FFT lowering.

The axon TPU backend has NO FFT implementation at all — every
``jnp.fft.*`` executable fails with ``UNIMPLEMENTED: TPU backend error``
(hardware-probed 2026-08-18: 1-D/2-D, f32/c64, any axis, any length).
Self-gravity (ops/selfgravity.py) is the only FFT consumer, so its
convolution is re-expressed the TPU-native way: a DFT is a matrix
multiply, and moderate transform sizes (2048 x 3072 at the flagship
grid) map onto the MXU as large real matmuls. No complex arrays are
materialised — spectra are carried as (real, imag) pairs, which also
sidesteps the backend's fragile complex support (complex128 device_puts
hang the axon tunnel, see CLAUDE.md).

Two lowering strategies per 1-D transform:

* **dense** — one O(L^2) DFT matrix per axis (the original backend).
* **factored** — the four-step Cooley-Tukey split L = L1*L2: two
  O(L*(L1+L2)) matmuls around an elementwise twiddle.  With
  L1 ~ L2 ~ sqrt(L) this cuts the matmul FLOPs ~sqrt(L)/2-fold (e.g.
  ~27x at L=3072) while staying pure-MXU.  Index math (input
  n = n1 + L1*n2, output k = k1*L2 + k2):

      A[n1,k2] = sum_{n2} x[n1 + L1 n2] W_{L2}^{n2 k2}
      B[n1,k2] = A[n1,k2] * W_L^{n1 k2}
      y[k1 L2 + k2] = sum_{n1} B[n1,k2] W_{L1}^{n1 k1}

  Zero-padded inputs (the SG convolution pads NR data rows to 2NR) and
  sliced outputs (only the first NR result rows / the K = N/2+1
  half-spectrum columns are consumed) both map onto n2/k1 block
  slices of the small DFT matrices — the factored path preserves the
  dense path's trick of never materialising the padding.

The factored path is used automatically when an axis length admits a
nontrivial factorisation (prime lengths fall back to dense); set
``FARGOCPT_TPU_SG_DFT=dense`` to force the dense matrices.

Layout-compatible with ``np.fft.rfft2`` on a real (R, N) array:
``forward`` returns the (R, N//2 + 1) half spectrum and ``inverse``
matches ``np.fft.irfft2(..., s=(R, N))``; parity is pinned by
tests/test_selfgravity.py against numpy end-to-end.

``precision`` defaults to HIGHEST (6-pass bf16 ~ f32-exact) because the
convolution kernels have strong cancellation near u=0, theta=0.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def _best_factors(L: int) -> tuple[int, int] | None:
    """(L1, L2) with L1*L2 = L, both > 1, L1 as close to sqrt(L) as
    possible (L1 <= L2). None when L is prime or too small to profit."""
    if L < 64:
        return None
    best = None
    for l1 in range(int(np.sqrt(L)), 1, -1):
        if L % l1 == 0:
            best = (l1, L // l1)
            break
    return best


class _Factored1D:
    """Four-step complex DFT of length L = L1*L2 along the last axis or
    axis 0, carried as (re, im) pairs.

    ``sign=-1`` is the forward convention exp(-2 pi i nk/L); ``scale``
    is folded into the last-stage matrix (1/L for inverses)."""

    def __init__(self, L: int, L1: int, L2: int, sign: int, dtype,
                 precision, scale: float = 1.0):
        self.L, self.L1, self.L2 = L, L1, L2
        self.precision = precision
        s = float(sign)
        w2 = np.outer(np.arange(L2), np.arange(L2)) % L2
        a2 = s * 2.0 * np.pi * w2 / L2
        self.w2r = jnp.asarray(np.cos(a2), dtype)            # (L2, L2)
        self.w2i = jnp.asarray(np.sin(a2), dtype)
        w1 = np.outer(np.arange(L1), np.arange(L1)) % L1
        a1 = s * 2.0 * np.pi * w1 / L1
        self.w1r = jnp.asarray(scale * np.cos(a1), dtype)    # (L1, L1)
        self.w1i = jnp.asarray(scale * np.sin(a1), dtype)
        tw = np.outer(np.arange(L1), np.arange(L2)) % L
        at = s * 2.0 * np.pi * tw / L
        self.twr = jnp.asarray(np.cos(at), dtype)            # (L1, L2)
        self.twi = jnp.asarray(np.sin(at), dtype)

    def _dot(self, sub, a, b):
        return jnp.einsum(sub, a, b, precision=self.precision)

    def apply_last(self, xr, xi=None, in_hi: int | None = None,
                   out_hi: int | None = None, real_output: bool = False):
        """Transform along the last axis. ``in_hi``: only the first
        ``in_hi`` input entries are nonzero (input may be given already
        truncated to in_hi; it is zero-padded to a whole number of n2
        blocks and the W2 rows beyond are dropped). ``out_hi``: only the
        first ``out_hi`` outputs are produced. ``real_output``: return
        only the real part (hermitian-inverse last stage)."""
        L, L1, L2 = self.L, self.L1, self.L2
        n2_keep = L2 if in_hi is None else -(-in_hi // L1)
        if xr.shape[-1] > n2_keep * L1:
            # a full-length input with in_hi < L: entries beyond in_hi
            # are zero by contract — truncate rather than compute a
            # negative pad width
            xr = xr[..., :n2_keep * L1]
            if xi is not None:
                xi = xi[..., :n2_keep * L1]
        elif xr.shape[-1] < n2_keep * L1:
            pad = [(0, 0)] * (xr.ndim - 1) + [(0, n2_keep * L1
                                               - xr.shape[-1])]
            xr = jnp.pad(xr, pad)
            if xi is not None:
                xi = jnp.pad(xi, pad)
        lead = xr.shape[:-1]
        X_r = xr.reshape(*lead, n2_keep, L1)
        w2r, w2i = self.w2r[:n2_keep], self.w2i[:n2_keep]
        if xi is None:
            ar = self._dot("...ba,bc->...ac", X_r, w2r)
            ai = self._dot("...ba,bc->...ac", X_r, w2i)
        else:
            X_i = xi.reshape(*lead, n2_keep, L1)
            ar = self._dot("...ba,bc->...ac", X_r, w2r) \
                - self._dot("...ba,bc->...ac", X_i, w2i)
            ai = self._dot("...ba,bc->...ac", X_r, w2i) \
                + self._dot("...ba,bc->...ac", X_i, w2r)
        br = ar * self.twr - ai * self.twi                   # (..., L1, L2)
        bi = ar * self.twi + ai * self.twr
        k1_keep = L1 if out_hi is None else -(-out_hi // L2)
        w1r, w1i = self.w1r[:, :k1_keep], self.w1i[:, :k1_keep]
        yr = self._dot("...ac,ad->...dc", br, w1r) \
            - self._dot("...ac,ad->...dc", bi, w1i)
        yr = yr.reshape(*lead, k1_keep * L2)
        if out_hi is not None:
            yr = yr[..., :out_hi]
        if real_output:
            return yr
        yi = self._dot("...ac,ad->...dc", br, w1i) \
            + self._dot("...ac,ad->...dc", bi, w1r)
        yi = yi.reshape(*lead, k1_keep * L2)
        if out_hi is not None:
            yi = yi[..., :out_hi]
        return yr, yi

    def apply_axis0(self, xr, xi=None, in_hi: int | None = None,
                    out_hi: int | None = None):
        """Transform along axis 0 (same index conventions)."""
        L, L1, L2 = self.L, self.L1, self.L2
        n2_keep = L2 if in_hi is None else -(-in_hi // L1)
        if xr.shape[0] > n2_keep * L1:
            # full-length input with in_hi < L: entries beyond in_hi are
            # zero by contract — truncate (negative pad would raise)
            xr = xr[:n2_keep * L1]
            if xi is not None:
                xi = xi[:n2_keep * L1]
        elif xr.shape[0] < n2_keep * L1:
            pad = [(0, n2_keep * L1 - xr.shape[0])] + [(0, 0)] * (xr.ndim - 1)
            xr = jnp.pad(xr, pad)
            if xi is not None:
                xi = jnp.pad(xi, pad)
        rest = xr.shape[1:]
        X_r = xr.reshape(n2_keep, L1, *rest)
        w2r, w2i = self.w2r[:n2_keep], self.w2i[:n2_keep]
        if xi is None:
            ar = self._dot("ba...,bc->ac...", X_r, w2r)
            ai = self._dot("ba...,bc->ac...", X_r, w2i)
        else:
            X_i = xi.reshape(n2_keep, L1, *rest)
            ar = self._dot("ba...,bc->ac...", X_r, w2r) \
                - self._dot("ba...,bc->ac...", X_i, w2i)
            ai = self._dot("ba...,bc->ac...", X_r, w2i) \
                + self._dot("ba...,bc->ac...", X_i, w2r)
        twr = self.twr.reshape(L1, L2, *([1] * len(rest)))
        twi = self.twi.reshape(L1, L2, *([1] * len(rest)))
        br = ar * twr - ai * twi                             # (L1, L2, ...)
        bi = ar * twi + ai * twr
        k1_keep = L1 if out_hi is None else -(-out_hi // L2)
        w1r, w1i = self.w1r[:, :k1_keep], self.w1i[:, :k1_keep]
        yr = self._dot("ac...,ad->dc...", br, w1r) \
            - self._dot("ac...,ad->dc...", bi, w1i)
        yi = self._dot("ac...,ad->dc...", br, w1i) \
            + self._dot("ac...,ad->dc...", bi, w1r)
        yr = yr.reshape(k1_keep * L2, *rest)
        yi = yi.reshape(k1_keep * L2, *rest)
        if out_hi is not None:
            yr, yi = yr[:out_hi], yi[:out_hi]
        return yr, yi


class RFFT2Plan:
    """Precomputed DFT operators for rfft2/irfft2 on a fixed (R, N) grid."""

    def __init__(self, nrows: int, ncols: int, dtype=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST):
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.kcols = self.ncols // 2 + 1
        self.precision = precision
        R, N, K = self.nrows, self.ncols, self.kcols

        force_dense = os.environ.get("FARGOCPT_TPU_SG_DFT", "") == "dense"
        fN = None if force_dense else _best_factors(N)
        fR = None if force_dense else _best_factors(R)
        self._fac_col = fN is not None
        self._fac_row = fR is not None

        if self._fac_col:
            N1, N2 = fN
            self._col_fwd = _Factored1D(N, N1, N2, -1, dtype, precision)
            self._col_inv = _Factored1D(N, N1, N2, +1, dtype, precision,
                                        scale=1.0 / N)
            # hermitian half-spectrum weights folded into the inverse input
            c = np.full(K, 2.0)
            c[0] = 1.0
            if N % 2 == 0:
                c[K - 1] = 1.0
            self._cw = jnp.asarray(c, dtype)
        else:
            ca, sa = self._twiddles(N)
            self.ca = jnp.asarray(ca[:, :K], dtype)            # (N, K) cos
            self.sa = jnp.asarray(-sa[:, :K], dtype)           # (N, K) -sin
            c = np.full(K, 2.0)
            c[0] = 1.0
            if N % 2 == 0:
                c[K - 1] = 1.0
            self.ia = jnp.asarray((c[:, None] * ca[:K, :]) / N, dtype)
            self.ib = jnp.asarray((-c[:, None] * sa[:K, :]) / N, dtype)

        if self._fac_row:
            R1, R2 = fR
            self._row_fwd = _Factored1D(R, R1, R2, -1, dtype, precision)
            self._row_inv = _Factored1D(R, R1, R2, +1, dtype, precision,
                                        scale=1.0 / R)
        else:
            cr, sr = self._twiddles(R)
            self.cr = jnp.asarray(cr, dtype)                   # (R, R)
            self.sr = jnp.asarray(sr, dtype)                   # (R, R)

    @staticmethod
    def _twiddles(n: int):
        """cos/sin tables cos(2 pi j k / n), sin(2 pi j k / n) in f64."""
        jk = np.outer(np.arange(n), np.arange(n))
        ang = 2.0 * np.pi * (jk % n) / n
        return np.cos(ang), np.sin(ang)

    def _dot(self, a, b):
        return jnp.dot(a, b, precision=self.precision)

    def forward(self, x):
        """rfft2 of a real (R0, N) array -> (re, im) each (R, K).

        R0 = x.shape[0] may be SMALLER than the plan's R: the remaining
        rows are treated as zeros without materialising them (the
        self-gravity convolution zero-pads NR data rows to 2NR; the
        padded half contributes nothing to the row-DFT stage, so the
        transform matrices are block-sliced instead — half the FLOPs)."""
        r0 = x.shape[0]
        K = self.kcols
        if self._fac_col:
            fr, fi = self._col_fwd.apply_last(x, out_hi=K)      # (R0, K)
        else:
            fr = self._dot(x, self.ca)                          # (R0, K)
            fi = self._dot(x, self.sa)
        if self._fac_row:
            gr, gi = self._row_fwd.apply_axis0(fr, fi, in_hi=r0)
        else:
            gr = self._dot(self.cr[:, :r0], fr) \
                + self._dot(self.sr[:, :r0], fi)
            gi = self._dot(self.cr[:, :r0], fi) \
                - self._dot(self.sr[:, :r0], fr)
        return gr, gi

    def inverse(self, gr, gi, rows: int | None = None):
        """irfft2 of an (R, K) half spectrum -> real (rows, N).

        ``rows`` (default R) returns only the FIRST ``rows`` output rows
        — the self-gravity convolution discards the padded bottom half,
        so the inverse row-DFT stage is output-sliced (half the FLOPs)."""
        r = self.nrows if rows is None else rows
        K = self.kcols
        if self._fac_row:
            fr, fi = self._row_inv.apply_axis0(gr, gi, out_hi=r)
        else:
            inv_r = 1.0 / self.nrows
            fr = (self._dot(self.cr[:r], gr)
                  - self._dot(self.sr[:r], gi)) * inv_r
            fi = (self._dot(self.cr[:r], gi)
                  + self._dot(self.sr[:r], gr)) * inv_r
        if self._fac_col:
            # y[n] = (1/N) Re sum_{k<K} c_k f[k] W_N^{+nk}: the hermitian
            # top half of the spectrum is folded into the c_k weights and
            # the implicit zero columns k >= K block-slice the transform
            return self._col_inv.apply_last(fr * self._cw, fi * self._cw,
                                            in_hi=K, real_output=True)
        return self._dot(fr, self.ia) + self._dot(fi, self.ib)

    @staticmethod
    def cmul(ar, ai, br, bi):
        """Elementwise complex multiply on (re, im) pairs."""
        return ar * br - ai * bi, ar * bi + ai * br
