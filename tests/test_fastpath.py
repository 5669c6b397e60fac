"""Gather-free fast paths (ops/polar_mm.py, transform_batch_mm) vs the
exact texture-semantics implementations."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.models.steps import align_step
from cryo_ralib_tpu.ops.polar import polar_resample
from cryo_ralib_tpu.ops.polar_mm import (
    build_polar_tables, polar_group_mm, translate_bilinear_mm)
from cryo_ralib_tpu.ops.search import (
    decode_params, prepare_ref_spectra, rotational_shift_search,
    rotational_shift_search_mm)
from cryo_ralib_tpu.ops.transform import transform_batch, transform_batch_mm
from cryo_ralib_tpu.params import AlignParams


def _smooth_stack(rng, n, nx, blobs=4):
    yy, xx = np.mgrid[0:nx, 0:nx]
    imgs = np.zeros((n, nx, nx), np.float32)
    for i in range(n):
        for _ in range(blobs):
            cy, cx = rng.uniform(nx * 0.3, nx * 0.7, 2)
            s = rng.uniform(3, 6)
            imgs[i] += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                              / (2 * s * s)).astype(np.float32)
    return imgs


def test_polar_group_matches_gather(rng):
    nx = 64
    cfg = AlignConfig(img_dim=nx, ring_num=18, ring_len=64, shift_step=1.0,
                      shift_rng_x=2.0, shift_rng_y=2.0)
    imgs = jnp.asarray(rng.standard_normal((6, nx, nx)).astype(np.float32))
    tables = build_polar_tables(cfg)
    coords = jnp.asarray(cfg.polar_coords)
    for yi, dy in enumerate(cfg.shift_y_vals):
        got = np.asarray(polar_group_mm(imgs, jnp.asarray(tables.wy[yi]),
                                        jnp.asarray(tables.wx),
                                        cfg.ring_num, cfg.ring_len))
        for xi, dx in enumerate(cfg.shift_x_vals):
            want = np.asarray(polar_resample(imgs, coords, float(dx), float(dy)))
            np.testing.assert_allclose(got[:, xi], want, atol=5e-5)


def test_translate_bilinear_integer_exact(rng):
    imgs = jnp.asarray(rng.standard_normal((4, 32, 32)).astype(np.float32))
    sx = jnp.asarray([1.0, -2.0, 0.0, 3.0])
    sy = jnp.asarray([-1.0, 0.0, 2.0, -3.0])
    got = np.asarray(translate_bilinear_mm(imgs, sx, sy))
    imgs_np = np.asarray(imgs)
    for i, (dx, dy) in enumerate(zip([1, -2, 0, 3], [-1, 0, 2, -3])):
        want = np.empty((32, 32), np.float32)
        for y in range(32):
            for x in range(32):
                want[y, x] = imgs_np[i, min(max(y + dy, 0), 31),
                                     min(max(x + dx, 0), 31)]
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_search_mm_matches_gather_integer_shifts(rng):
    n, nx, k = 10, 64, 3
    cfg = AlignConfig(img_dim=nx, ring_num=20, ring_len=256, shift_step=1.0,
                      shift_rng_x=2.0, shift_rng_y=2.0)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams(
        jnp.zeros(n), jnp.asarray(rng.integers(-2, 3, n).astype(np.float32)),
        jnp.asarray(rng.integers(-2, 3, n).astype(np.float32)),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32))
    r1 = rotational_shift_search(imgs, rfw, params, cfg, shift_chunk=25)
    r2 = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=False)
    np.testing.assert_array_equal(np.asarray(r1.best_aidx), np.asarray(r2.best_aidx))
    np.testing.assert_array_equal(np.asarray(r1.best_sidx), np.asarray(r2.best_sidx))
    np.testing.assert_array_equal(np.asarray(r1.best_ref), np.asarray(r2.best_ref))
    np.testing.assert_array_equal(np.asarray(r1.best_mirror), np.asarray(r2.best_mirror))
    p1 = decode_params(r1, params, cfg)
    p2 = decode_params(r2, params, cfg)
    np.testing.assert_allclose(np.asarray(p1.angle), np.asarray(p2.angle),
                               atol=1e-4)

    # bf16 fast mode: decisions must agree on structured data to ~degree level
    r3 = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=True)
    assert (np.asarray(r1.best_ref) == np.asarray(r3.best_ref)).mean() >= 0.9
    p3 = decode_params(r3, params, cfg)
    d = np.abs(np.asarray(p1.angle) - np.asarray(p3.angle))
    d = np.minimum(d, 360.0 - d)
    same = np.asarray(r1.best_aidx) == np.asarray(r3.best_aidx)
    assert d[same].max() < 0.1


def test_transform_mm_quadrants_exact(rng):
    imgs = jnp.asarray(_smooth_stack(rng, 3, 90))
    for ang in [0.0, 90.0, 180.0, 270.0]:
        for m in [0, 1]:
            p = AlignParams(jnp.full(3, ang), jnp.zeros(3), jnp.zeros(3),
                            jnp.full(3, m, jnp.int32), jnp.zeros(3, jnp.int32))
            want = np.asarray(transform_batch(imgs, p))
            got = np.asarray(transform_batch_mm(imgs, p))
            np.testing.assert_allclose(got, want, atol=1e-4)


def test_transform_mm_close_to_bilinear(rng):
    nx = 90
    imgs = jnp.asarray(_smooth_stack(rng, 6, nx))
    p = AlignParams(jnp.asarray(rng.uniform(0, 360, 6).astype(np.float32)),
                    jnp.asarray(rng.uniform(-3, 3, 6).astype(np.float32)),
                    jnp.asarray(rng.uniform(-3, 3, 6).astype(np.float32)),
                    jnp.asarray(rng.integers(0, 2, 6), jnp.int32),
                    jnp.zeros(6, jnp.int32))
    want = np.asarray(transform_batch(imgs, p))
    got = np.asarray(transform_batch_mm(imgs, p))
    yy, xx = np.mgrid[0:nx, 0:nx]
    disc = ((yy - nx // 2) ** 2 + (xx - nx // 2) ** 2) < (nx // 2 - 5) ** 2
    for i in range(6):
        scale = np.abs(want[i][disc]).max()
        rms = np.sqrt(((want[i] - got[i])[disc] ** 2).mean()) / scale
        assert rms < 5e-3, rms


def test_align_step_matmul_vs_gather(rng):
    """Full fused step: the two engines agree on assignments and params."""
    n, nx, k = 16, 64, 3
    cfg = AlignConfig(img_dim=nx, ring_num=20, ring_len=256, shift_step=1.0,
                      shift_rng_x=2.0, shift_rng_y=2.0)
    base = _smooth_stack(rng, k, nx)
    cls = rng.integers(0, k, n)
    imgs = jnp.asarray(base[cls] + rng.normal(0, 0.01, (n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(base)
    gidx = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones(n, jnp.float32)

    def run(sampler):
        return align_step(imgs, refs, AlignParams.zeros(n), gidx, valid,
                          cfg=cfg, n_classes=k, update_ref=True,
                          sampler=sampler, shift_chunk=25)

    o1 = run("gather")
    o2 = run("matmul")
    np.testing.assert_array_equal(np.asarray(o1.params.ref_id),
                                  np.asarray(o2.params.ref_id))
    np.testing.assert_array_equal(np.asarray(o1.counts), np.asarray(o2.counts))
    d = np.abs(np.asarray(o1.params.angle) - np.asarray(o2.params.angle))
    d = np.minimum(d, 360.0 - d)
    assert d.max() < 0.5
    # class sums differ only by the interpolation kernel
    s1 = np.asarray(o1.class_sums)
    s2 = np.asarray(o2.class_sums)
    assert np.abs(s1 - s2).max() / np.abs(s1).max() < 0.05


def test_rot_shift2d_shear_engine(rng):
    from cryo_ralib_tpu.utils.synthetic import class_templates

    imgs = jnp.asarray(np.repeat(class_templates(1, 90), 5, axis=0))
    angs = jnp.asarray(rng.uniform(0, 360, 5).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-3, 3, 5).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-3, 3, 5).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, 5), jnp.int32)
    from cryo_ralib_tpu.ops.transform import rot_shift2d as rs
    a = np.asarray(rs(imgs, angs, sx, sy, mirror=m, engine="quadri"))
    b = np.asarray(rs(imgs, angs, sx, sy, mirror=m, engine="shear"))
    yy, xx = np.mgrid[0:90, 0:90]
    disc = ((yy - 45) ** 2 + (xx - 45) ** 2) < 38 ** 2
    for i in range(5):
        sc = np.abs(a[i][disc]).max()
        assert np.sqrt(((a[i] - b[i])[disc] ** 2).mean()) / sc < 5e-3
    with pytest.raises(ValueError):
        rs(imgs, angs, sx, sy, scale=jnp.ones(5), engine="shear")
