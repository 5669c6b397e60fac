"""Matmul-DFT vs numpy FFT parity (ops/dft.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu.ops.dft import irfft2_mm, irfft_mm, rfft2_mm, rfft_mm


def test_rfft_mm_matches_numpy(rng):
    x = rng.standard_normal((5, 7, 256)).astype(np.float32)
    got = np.asarray(rfft_mm(jnp.asarray(x)))
    want = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3 * np.abs(want).max())


def test_irfft_mm_roundtrip(rng):
    x = rng.standard_normal((4, 3, 64)).astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    got = np.asarray(irfft_mm(jnp.asarray(spec.astype(np.complex64)), n=64))
    np.testing.assert_allclose(got, x, atol=1e-4)


@pytest.mark.parametrize("shape", [(90, 90), (64, 64), (33, 48)])
def test_rfft2_mm_matches_numpy(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(rfft2_mm(jnp.asarray(x)))
    want = np.fft.rfft2(x)
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-3 * np.abs(want).max())


@pytest.mark.parametrize("shape", [(90, 90), (33, 48)])
def test_irfft2_mm_roundtrip(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    spec = np.fft.rfft2(x).astype(np.complex64)
    got = np.asarray(irfft2_mm(jnp.asarray(spec), s=shape))
    np.testing.assert_allclose(got, x, atol=1e-4)


def test_odd_length_rfft(rng):
    x = rng.standard_normal((2, 45)).astype(np.float32)
    got = np.asarray(rfft_mm(jnp.asarray(x)))
    want = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1.0, np.abs(want).max()))
    back = np.asarray(irfft_mm(jnp.asarray(want.astype(np.complex64)), n=45))
    np.testing.assert_allclose(back, x, atol=1e-4)
