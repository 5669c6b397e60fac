"""Fused Pallas search kernels (interpret mode on CPU) vs the XLA paths."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.ops.fused_search import fused_search, fused_supported
from cryo_ralib_tpu.ops.search import (decode_params, prepare_ref_spectra,
                                       rotational_shift_search_mm)
from cryo_ralib_tpu.params import AlignParams
from cryo_ralib_tpu.utils.synthetic import class_templates, scattered_stack


def _cfg(nx=64, rings=20, xr=2.0):
    return AlignConfig(img_dim=nx, ring_num=rings, ring_len=256,
                       shift_step=1.0, shift_rng_x=xr, shift_rng_y=xr)


def test_fused_supported_gates():
    from cryo_ralib_tpu.ops.fused_search import max_chunk_k

    assert fused_supported(_cfg(), 3)
    assert fused_supported(_cfg(90, 36, 3.0), 8)
    assert not fused_supported(
        AlignConfig(img_dim=64, ring_num=20, ring_len=128), 3)
    # large K is admitted via ref-axis chunking; one chunk stays VMEM-sized
    assert fused_supported(_cfg(90, 36, 3.0), 512)
    assert max_chunk_k(_cfg(90, 36, 3.0)) <= 34


def test_fused_matches_matmul_random(rng):
    n, nx, k = 8, 64, 3
    cfg = _cfg(nx)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams(
        jnp.zeros(n), jnp.asarray(rng.integers(-2, 3, n).astype(np.float32)),
        jnp.asarray(rng.integers(-2, 3, n).astype(np.float32)),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32))
    r_mm = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=True)
    r_fu = fused_search(imgs, rfw, params, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_mm.best_aidx),
                                  np.asarray(r_fu.best_aidx))
    np.testing.assert_array_equal(np.asarray(r_mm.best_sidx),
                                  np.asarray(r_fu.best_sidx))
    np.testing.assert_array_equal(np.asarray(r_mm.best_ref),
                                  np.asarray(r_fu.best_ref))
    np.testing.assert_array_equal(np.asarray(r_mm.best_mirror),
                                  np.asarray(r_fu.best_mirror))
    va = np.asarray(r_mm.best_val)
    np.testing.assert_allclose(np.asarray(r_fu.best_val), va,
                               atol=5e-3 * np.abs(va).max())
    p_mm = decode_params(r_mm, params, cfg)
    p_fu = decode_params(r_fu, params, cfg)
    d = np.abs(np.asarray(p_mm.angle) - np.asarray(p_fu.angle))
    d = np.minimum(d, 360.0 - d)
    assert d.max() < 0.05, d.max()


def test_fused_recovers_structured(rng):
    """On well-separated class data the fused search recovers classes and
    shifts exactly like the exact gather path."""
    from cryo_ralib_tpu.ops.search import rotational_shift_search

    k, nx, n = 3, 64, 12
    base = class_templates(k, nx)
    imgs, cls, _, shifts = scattered_stack(base, n, max_shift=2, seed=23)
    cfg = _cfg(nx, rings=24)
    rfw = prepare_ref_spectra(jnp.asarray(base), cfg)
    params = AlignParams.zeros(n)
    r_ex = rotational_shift_search(jnp.asarray(imgs), rfw, params, cfg,
                                   shift_chunk=25)
    r_fu = fused_search(jnp.asarray(imgs), rfw, params, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_ex.best_ref),
                                  np.asarray(r_fu.best_ref))
    np.testing.assert_array_equal(np.asarray(r_ex.best_sidx),
                                  np.asarray(r_fu.best_sidx))
    assert (np.asarray(r_fu.best_ref) == cls).all()


def test_fused_single_ref(rng):
    """K=1 (the reffree workload) takes a dedicated 2D ccf branch in the
    banded kernel (Mosaic rejects the degenerate 3D broadcast); it must
    match the matmul path exactly."""
    n, nx = 8, 64
    cfg = _cfg(nx)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((1, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams.zeros(n)
    r_mm = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=True)
    r_fu = fused_search(imgs, rfw, params, cfg, interpret=True)
    for f in ("best_aidx", "best_sidx", "best_mirror"):
        np.testing.assert_array_equal(np.asarray(getattr(r_mm, f)),
                                      np.asarray(getattr(r_fu, f)))
    va = np.asarray(r_mm.best_val)
    np.testing.assert_allclose(np.asarray(r_fu.best_val), va,
                               atol=5e-3 * np.abs(va).max())


def test_fused_odd_batch_padding(rng):
    """N not a multiple of the tile size: padded particles are dropped."""
    n, nx, k = 5, 64, 2
    cfg = _cfg(nx)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    r = fused_search(imgs, rfw, AlignParams.zeros(n), cfg, interpret=True)
    assert r.best_val.shape == (n,)
    r_mm = rotational_shift_search_mm(imgs, rfw, AlignParams.zeros(n), cfg,
                                      fast=True)
    np.testing.assert_array_equal(np.asarray(r.best_ref),
                                  np.asarray(r_mm.best_ref))


def test_fused_odd_geometry(rng):
    """Odd image size (75 px -> hp=80 pad) and fractional shift step."""
    n, nx, k = 8, 75, 2
    cfg = AlignConfig(img_dim=nx, ring_num=20, ring_len=256,
                      shift_step=0.5, shift_rng_x=1.0, shift_rng_y=1.0)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams.zeros(n)
    r_mm = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=True)
    r_fu = fused_search(imgs, rfw, params, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_mm.best_sidx),
                                  np.asarray(r_fu.best_sidx))
    np.testing.assert_array_equal(np.asarray(r_mm.best_ref),
                                  np.asarray(r_fu.best_ref))
    np.testing.assert_array_equal(np.asarray(r_mm.best_aidx),
                                  np.asarray(r_fu.best_aidx))
    # fractional-step grid: 5 distinct values each axis
    assert cfg.shifts.shape == (25, 2)
    # decode applies the fractional shifts
    p = decode_params(r_fu, params, cfg)
    assert set(np.round(np.unique(np.abs(np.asarray(p.shift_x))), 3)) \
        <= {0.0, 0.5, 1.0}


def test_fused_nomirror_matches_matmul(rng):
    """--nomirror specialization: no acc_m scratch, halved priority table
    (r3); winners must match the XLA path with the mirror channel off."""
    n, nx, k = 8, 64, 3
    cfg = AlignConfig(img_dim=nx, ring_num=20, ring_len=256,
                      shift_step=1.0, shift_rng_x=2.0, shift_rng_y=2.0,
                      mirror=False)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams.zeros(n)
    r_mm = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=True)
    r_fu = fused_search(imgs, rfw, params, cfg, interpret=True)
    assert np.all(np.asarray(r_fu.best_mirror) == 0)
    va = np.asarray(r_mm.best_val)
    np.testing.assert_allclose(np.asarray(r_fu.best_val), va,
                               atol=5e-3 * np.abs(va).max())
    # random-noise candidates can tie within bf16 rounding; winners must
    # agree except where the two engines' peaks are within that noise
    # (same contract as tools/tpu_parity_check.py)
    same = ((np.asarray(r_mm.best_aidx) == np.asarray(r_fu.best_aidx))
            & (np.asarray(r_mm.best_sidx) == np.asarray(r_fu.best_sidx))
            & (np.asarray(r_mm.best_ref) == np.asarray(r_fu.best_ref)))
    gap = np.abs(np.asarray(r_fu.best_val) - va) / np.abs(va).max()
    assert np.all(same | (gap <= 5e-3)), (same, gap)
    assert same.mean() >= 0.75, same


def test_fused_supported_mode_and_mirror_gates():
    from cryo_ralib_tpu.ops.fused_search import max_chunk_k

    cfg_h = AlignConfig(img_dim=64, ring_num=20, ring_len=256, mode="H")
    assert not fused_supported(cfg_h, 3)
    # nomirror halves the scratch: chunk capacity doubles
    big = AlignConfig(img_dim=90, ring_num=36, ring_len=256,
                      shift_step=1.0, shift_rng_x=3.0, shift_rng_y=3.0)
    big_nm = AlignConfig(img_dim=90, ring_num=36, ring_len=256,
                         shift_step=1.0, shift_rng_x=3.0, shift_rng_y=3.0,
                         mirror=False)
    assert max_chunk_k(big) < max_chunk_k(big_nm) <= min(
        2 * max_chunk_k(big) + 1, 128)


def test_fused_chunked_matches_single(rng):
    """K beyond one chunk: forced 2-ref chunks must reproduce the
    single-invocation result exactly (priority-order merge)."""
    n, nx, k = 8, 64, 6
    cfg = _cfg(nx)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams.zeros(n)
    one = fused_search(imgs, rfw, params, cfg, interpret=True)
    chk = fused_search(imgs, rfw, params, cfg, interpret=True, _k_chunk=2)
    for f in one._fields:
        np.testing.assert_array_equal(np.asarray(getattr(one, f)),
                                      np.asarray(getattr(chk, f)), err_msg=f)
    # an explicit _k_chunk is honored verbatim — k=6 at _k_chunk=4 runs
    # the UNEVEN 4+2 split (no equalization, ADVICE r4) and must still
    # merge bit-identically
    unev = fused_search(imgs, rfw, params, cfg, interpret=True, _k_chunk=4)
    for f in one._fields:
        np.testing.assert_array_equal(np.asarray(getattr(one, f)),
                                      np.asarray(getattr(unev, f)), err_msg=f)


def test_fold_finalize_matches_standard(rng):
    """r5 running-priority fold finalize (single-kernel large K): the
    per-slab (max, min-priority) fold and in-fold winner-row capture
    must be bit-identical to the materialized rows_scr finalize —
    including under a --dst angle mask (the fold masks per-lane values
    before capturing the winner row)."""
    from cryo_ralib_tpu.ops.search import delta_angle_mask

    n, nx, k = 8, 64, 4
    cfg = _cfg(nx, rings=20, xr=1.0)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams.zeros(n)
    base = fused_search(imgs, rfw, params, cfg, interpret=True)
    fld = fused_search(imgs, rfw, params, cfg, interpret=True, fold=True)
    for f in base._fields:
        np.testing.assert_array_equal(np.asarray(getattr(base, f)),
                                      np.asarray(getattr(fld, f)), err_msg=f)
    mask = delta_angle_mask(cfg.ring_len, 45.0, cfg.mode)
    bm = fused_search(imgs, rfw, params, cfg, interpret=True,
                      angle_mask=mask)
    fm = fused_search(imgs, rfw, params, cfg, interpret=True,
                      angle_mask=mask, fold=True)
    for f in base._fields:
        np.testing.assert_array_equal(np.asarray(getattr(bm, f)),
                                      np.asarray(getattr(fm, f)), err_msg=f)


def test_chunk_equalization():
    """Default-path chunk equalization (ADVICE r4): K=64 at capacity 33
    runs 32+32 (one compiled shape), and sizes never exceed capacity."""
    from cryo_ralib_tpu.ops.fused_search import _equalized_chunk

    assert _equalized_chunk(64, 33) == 32
    assert _equalized_chunk(8, 5) == 4
    assert _equalized_chunk(65, 33) == 33   # 33+32: equal is impossible
    for k in range(2, 130):
        for kc in range(1, k):
            e = _equalized_chunk(k, kc)
            assert e <= kc and -(-k // e) == -(-k // kc), (k, kc, e)


def test_fused_big_box_matches_matmul(rng):
    """Boxes >128 px run fused through the 128-wide central x-window
    (r3; reference handles arbitrary img_dim natively,
    cuda/gpu_aln_common.h:48-54)."""
    n, nx, rings, k = 8, 160, 48, 3
    cfg = AlignConfig(img_dim=nx, ring_num=rings, ring_len=256,
                      shift_step=1.0, shift_rng_x=2.0, shift_rng_y=2.0)
    assert fused_supported(cfg, k)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    rfw = prepare_ref_spectra(refs, cfg)
    params = AlignParams(
        jnp.zeros(n), jnp.asarray(rng.integers(-2, 3, n).astype(np.float32)),
        jnp.asarray(rng.integers(-2, 3, n).astype(np.float32)),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32))
    r_mm = rotational_shift_search_mm(imgs, rfw, params, cfg, fast=True)
    r_fu = fused_search(imgs, rfw, params, cfg, interpret=True)
    va = np.asarray(r_mm.best_val)
    np.testing.assert_allclose(np.asarray(r_fu.best_val), va,
                               atol=5e-3 * np.abs(va).max())
    same = ((np.asarray(r_mm.best_aidx) == np.asarray(r_fu.best_aidx))
            & (np.asarray(r_mm.best_sidx) == np.asarray(r_fu.best_sidx))
            & (np.asarray(r_mm.best_ref) == np.asarray(r_fu.best_ref)))
    gap = np.abs(np.asarray(r_fu.best_val) - va) / np.abs(va).max()
    assert np.all(same | (gap <= 5e-3)), (same, gap)


def test_fused_big_box_gate():
    # ring extent beyond the 128-lane window falls back to matmul
    big = AlignConfig(img_dim=200, ring_num=70, ring_len=256,
                      shift_step=1.0, shift_rng_x=3.0, shift_rng_y=3.0)
    assert not fused_supported(big, 3)
    ok = AlignConfig(img_dim=360, ring_num=56, ring_len=256,
                     shift_step=1.0, shift_rng_x=3.0, shift_rng_y=3.0)
    assert fused_supported(ok, 3)
