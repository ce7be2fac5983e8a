"""FFT family vs numpy reference (mirrors unit_test/test_fft.cpp)."""

import numpy as np
import pytest

from block2_preview_tpu.utils.fft import (dft, fft, fft_bluestein, fft_pow2,
                                          fft_rader, ifft)


@pytest.mark.parametrize("n", [1, 2, 4, 8, 64, 256])
def test_pow2(n):
    rng = np.random.RandomState(n)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    assert np.allclose(fft(x), np.fft.fft(x), atol=1e-10)
    assert np.allclose(ifft(x), np.fft.ifft(x), atol=1e-10)


@pytest.mark.parametrize("n", [3, 5, 7, 11, 13, 97, 251])
def test_rader_prime(n):
    rng = np.random.RandomState(n)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    assert np.allclose(fft_rader(x), np.fft.fft(x), atol=1e-9)
    assert np.allclose(fft_rader(x, inverse=True), np.fft.ifft(x),
                       atol=1e-9)


@pytest.mark.parametrize("n", [6, 9, 12, 15, 100, 360])
def test_bluestein_composite(n):
    rng = np.random.RandomState(n)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    assert np.allclose(fft_bluestein(x), np.fft.fft(x), atol=1e-9)
    assert np.allclose(fft(x), np.fft.fft(x), atol=1e-9)
    assert np.allclose(ifft(x), np.fft.ifft(x), atol=1e-9)


def test_dft_and_batch():
    rng = np.random.RandomState(0)
    x = rng.standard_normal((3, 10)) + 1j * rng.standard_normal((3, 10))
    assert np.allclose(dft(x), np.fft.fft(x, axis=-1), atol=1e-10)
    assert np.allclose(fft(x), np.fft.fft(x, axis=-1), atol=1e-9)
    # roundtrip
    assert np.allclose(ifft(fft(x)), x, atol=1e-9)
