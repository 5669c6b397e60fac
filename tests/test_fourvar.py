"""Fourier variance of aligned stacks (ops/fourvar.py, varf2d semantics).

Reference behavior: test_reffree_gpu_align.py:777-831 (--Fourvar in the
CPU twin; the GPU path never implemented it).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu.ops.fourvar import (divide_by_variance,
                                        fourier_variance, radial_variance,
                                        variance_map)
from cryo_ralib_tpu.params import AlignParams
from cryo_ralib_tpu.utils.synthetic import class_templates, scattered_stack


def _rand_params(rng, n):
    return AlignParams(
        rng.uniform(0, 360, n).astype(np.float32),
        rng.uniform(-2, 2, n).astype(np.float32),
        rng.uniform(-2, 2, n).astype(np.float32),
        rng.integers(0, 2, n).astype(np.int32),
        np.zeros(n, np.int32))


def test_variance_matches_numpy_oracle(rng):
    """Chunked device moments == direct numpy variance of the same
    (exact-engine) transformed images."""
    from cryo_ralib_tpu.ops.transform import transform_batch

    n, nx = 14, 32
    imgs = rng.standard_normal((n, nx, nx)).astype(np.float32)
    params = _rand_params(rng, n)

    var, rvar = fourier_variance(imgs, params, batch=5, engine="exact")

    t = np.asarray(transform_batch(jnp.asarray(imgs), params))
    f = np.fft.rfft2(t.astype(np.float64))
    want = np.maximum(
        (np.abs(f) ** 2).sum(0)
        - np.abs(f.sum(0)) ** 2 / n, 0.0) / (n - 1)
    np.testing.assert_allclose(var, want, rtol=2e-3, atol=1e-4 * want.max())
    assert rvar.shape == (nx // 2 + 1,)


def test_identical_images_zero_variance(rng):
    n, nx = 8, 32
    img = rng.standard_normal((nx, nx)).astype(np.float32)
    imgs = np.broadcast_to(img, (n, nx, nx)).copy()
    var, rvar = fourier_variance(imgs, AlignParams.zeros(n), engine="exact")
    assert var.max() <= 1e-3 * (np.abs(np.fft.rfft2(img)) ** 2).max()
    assert rvar.max() <= 1e-2


def test_white_noise_variance_flat(rng):
    """White noise: per-frequency variance is ~flat at sigma^2 * npix."""
    n, nx, sigma = 400, 24, 1.0
    imgs = (sigma * rng.standard_normal((n, nx, nx))).astype(np.float32)
    var, rvar = fourier_variance(imgs, AlignParams.zeros(n), engine="exact")
    expect = sigma ** 2 * nx * nx
    # skip DC (mean-estimate noise) — the rest should sit near expect
    assert abs(np.median(var) - expect) / expect < 0.2
    assert abs(np.median(rvar[1:]) - expect) / expect < 0.2


def test_divide_by_variance_scales(rng):
    nx = 32
    avg = rng.standard_normal((nx, nx)).astype(np.float32)
    var = np.full((nx, nx // 2 + 1), 4.0, np.float32)
    out = divide_by_variance(avg, var)
    np.testing.assert_allclose(out, avg / 4.0, atol=1e-5)


def test_variance_map_hermitian_unfold(rng):
    n, nx = 6, 16
    imgs = rng.standard_normal((n, nx, nx)).astype(np.float32)
    var, _ = fourier_variance(imgs, AlignParams.zeros(n), engine="exact")
    m = variance_map(var)
    assert m.shape == (nx, nx)
    # Friedel symmetry: the map is centro-symmetric about the DC pixel
    ms = np.fft.ifftshift(m)
    np.testing.assert_allclose(
        ms, ms[(-np.arange(nx)) % nx][:, (-np.arange(nx)) % nx], rtol=1e-5)


def test_reffree_driver_fourvar(tmp_path, rng):
    """--Fourvar end-to-end: varf.hdf written per iteration, rvar logged,
    and the variance-divided average still drives a working alignment."""
    from cryo_ralib_tpu.io.eman_hdf import read_hdf_stack
    from cryo_ralib_tpu.models.reffree import ali2d_base_tpu

    base = class_templates(1, 48)
    imgs, _, _, _ = scattered_stack(base, 20, max_shift=1, seed=7)
    outdir = str(tmp_path / "fv")
    res = ali2d_base_tpu(imgs, outdir=outdir, ou=20, xr=1, ts=1, maxit=2,
                         Fourvar=True, sampler="gather",
                         user_func_name="ref_ali2d_no_filter")
    assert len(res.radial_variances) == res.iterations
    assert res.radial_variances[0].shape == (25,)
    varf = read_hdf_stack(f"{outdir}/varf.hdf")[0]
    assert varf.shape[0] == res.iterations
    assert np.all(np.isfinite(varf))
