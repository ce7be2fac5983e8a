"""Self-contained FFT family (reference src/core/fft.hpp:42-396).

The reference ships its own FFT (BasicFFT radix-2, RaderFFT for prime
sizes, BluesteinFFT for arbitrary sizes, naive DFT, and a FactorizedFFT
dispatcher) to avoid an MKL/FFTW dependency; it backs the Green's-function
and time-frequency tooling.  Here the same surface is provided on top of
explicit implementations (not np.fft) so behavior is dependency-free and
verifiable, with `fft`/`ifft` entry points that dispatch like
FactorizedFFT (fft.hpp:396).

All transforms follow the NumPy sign convention:
    X[k] = sum_j x[j] * exp(-2 pi i j k / n)       (forward)
"""

from __future__ import annotations

import numpy as np


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def dft(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Naive O(n^2) DFT (reference DFT, fft.hpp:349)."""
    x = np.asarray(x, dtype=np.complex128)
    n = x.shape[-1]
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    out = x @ w
    return out / n if inverse else out


def fft_pow2(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Iterative radix-2 Cooley-Tukey (reference BasicFFT, fft.hpp:42)."""
    x = np.array(x, dtype=np.complex128)
    n = x.shape[-1]
    assert _is_pow2(n)
    # bit reversal
    j = 0
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    bits = n.bit_length() - 1
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    x = x[..., rev]
    sign = 2j if inverse else -2j
    m = 2
    while m <= n:
        w = np.exp(sign * np.pi * np.arange(m // 2) / m)
        x = x.reshape(*x.shape[:-1], n // m, m)
        even = x[..., :m // 2]
        odd = x[..., m // 2:] * w
        x = np.concatenate([even + odd, even - odd], axis=-1)
        x = x.reshape(*x.shape[:-2], n)
        m <<= 1
    return x / n if inverse else x


def _primitive_root(p: int) -> int:
    """Smallest primitive root mod prime p (reference Prime::primitive_root)."""
    phi = p - 1
    fac = []
    m = phi
    d = 2
    while d * d <= m:
        if m % d == 0:
            fac.append(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        fac.append(m)
    for g in range(2, p):
        if all(pow(g, phi // f, p) != 1 for f in fac):
            return g
    raise ValueError(f"no primitive root for {p}")


def fft_rader(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Rader's algorithm for prime n (reference RaderFFT, fft.hpp:195):
    maps the DFT to a cyclic convolution of length n-1 via a primitive
    root, evaluated with pow2 FFTs after zero-padding."""
    x = np.asarray(x, dtype=np.complex128)
    n = x.shape[-1]
    if n == 2:
        out = np.stack([x[..., 0] + x[..., 1], x[..., 0] - x[..., 1]],
                       axis=-1)
        return out / n if inverse else out
    g = _primitive_root(n)
    # permutations: a_q = x[g^q], b_q = w^(g^{-q})
    gq = np.ones(n - 1, dtype=np.int64)
    for q in range(1, n - 1):
        gq[q] = gq[q - 1] * g % n
    ginv = np.zeros(n - 1, dtype=np.int64)
    ginv[0] = 1
    gi = pow(g, n - 2, n)   # g^{-1} mod n
    for q in range(1, n - 1):
        ginv[q] = ginv[q - 1] * gi % n
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * ginv / n)
    m = 1
    while m < 2 * (n - 1) - 1:
        m <<= 1
    a = np.zeros(x.shape[:-1] + (m,), dtype=np.complex128)
    a[..., :n - 1] = x[..., gq]
    b = np.zeros(m, dtype=np.complex128)
    b[:n - 1] = w
    b[m - (n - 2):] = w[1:]          # wrap for cyclic convolution
    conv = fft_pow2(fft_pow2(a) * fft_pow2(b), inverse=True) * m
    conv = conv[..., :n - 1] / m
    out = np.zeros_like(x)
    out[..., 0] = x.sum(axis=-1)
    out[..., ginv] = x[..., :1] + conv
    return out / n if inverse else out


def fft_bluestein(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Bluestein chirp-z transform for arbitrary n (reference BluesteinFFT,
    fft.hpp:279)."""
    x = np.asarray(x, dtype=np.complex128)
    n = x.shape[-1]
    sign = 1j if inverse else -1j
    k = np.arange(n)
    chirp = np.exp(sign * np.pi * (k * k % (2 * n)) / n)
    m = 1
    while m < 2 * n - 1:
        m <<= 1
    a = np.zeros(x.shape[:-1] + (m,), dtype=np.complex128)
    a[..., :n] = x * chirp
    b = np.zeros(m, dtype=np.complex128)
    b[:n] = np.conj(chirp)
    b[m - (n - 1):] = np.conj(chirp[1:][::-1])
    conv = fft_pow2(fft_pow2(a) * fft_pow2(b), inverse=True)
    out = conv[..., :n] * chirp
    return out / n if inverse else out


def fft(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    """FactorizedFFT-style dispatch (fft.hpp:396): pow2 -> radix-2;
    prime -> Rader; otherwise Bluestein."""
    x = np.asarray(x, dtype=np.complex128)
    n = x.shape[-1]
    if n <= 1:
        return x.astype(np.complex128)
    if _is_pow2(n):
        return fft_pow2(x, inverse)
    # primality test (n is small in practice)
    is_prime = n > 1 and all(n % d for d in range(2, int(n ** 0.5) + 1))
    if is_prime:
        return fft_rader(x, inverse)
    return fft_bluestein(x, inverse)


def ifft(x: np.ndarray) -> np.ndarray:
    return fft(x, inverse=True)
