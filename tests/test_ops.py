"""Golden-value tests: JAX ops vs the NumPy oracle (CUDA semantics)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu import AlignConfig, AlignParams
from cryo_ralib_tpu.ops import (
    bilinear_sample,
    class_sum_oe,
    decode_params,
    filt_tanl,
    fshift,
    model_circle,
    normalize_mask,
    polar_resample,
    prepare_ref_spectra,
    quadri_sample,
    rot_shift2d,
    rotational_shift_search,
    transform_batch,
)
from cryo_ralib_tpu.utils import oracle
from tests.conftest import make_disc_stack

NX = 64


@pytest.fixture(scope="module")
def cfg():
    return AlignConfig(img_dim=NX, ring_num=24, ring_len=128,
                       shift_step=1.0, shift_rng_x=2.0, shift_rng_y=2.0)


@pytest.fixture(scope="module")
def stack():
    r = np.random.default_rng(7)
    return make_disc_stack(r, 6, NX)


def test_config_grids(cfg):
    assert cfg.shifts.shape == (25, 2)
    assert cfg.polar_coords.shape == (24, 128, 2)
    # ring i radius is i+1 (cuda/gpu_aln_common.cu:55-58)
    radii = np.linalg.norm(cfg.polar_coords, axis=-1)
    np.testing.assert_allclose(radii[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(radii[-1], 24.0, atol=1e-4)
    # x-major shift enumeration like generate_shift_array
    np.testing.assert_allclose(cfg.shifts[0], [-2.0, -2.0])
    np.testing.assert_allclose(cfg.shifts[1], [-2.0, -1.0])
    np.testing.assert_allclose(cfg.shifts[-1], [2.0, 2.0])


def test_bilinear_matches_oracle(stack):
    r = np.random.default_rng(3)
    ys = r.uniform(-2, NX + 2, (6, 50)).astype(np.float32)
    xs = r.uniform(-2, NX + 2, (6, 50)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(stack), jnp.asarray(ys), jnp.asarray(xs)))
    for n in range(6):
        for m in range(50):
            want = oracle.bilinear_sample_np(stack[n].astype(np.float64), ys[n, m], xs[n, m])
            assert abs(got[n, m] - want) < 1e-4


def test_polar_resample_matches_oracle(cfg, stack):
    coords = cfg.polar_coords
    sx = np.array([0.5, -1.0, 0.0, 2.0, -0.25, 1.5], np.float32)
    sy = np.array([-0.5, 1.0, 0.0, -2.0, 0.75, 0.0], np.float32)
    got = np.asarray(polar_resample(jnp.asarray(stack), jnp.asarray(coords),
                                    jnp.asarray(sx), jnp.asarray(sy)))
    for n in range(6):
        want = oracle.polar_resample_np(stack[n].astype(np.float64), coords,
                                        sx[n], sy[n])
        np.testing.assert_allclose(got[n], want, atol=2e-4)


def test_search_matches_oracle(cfg, stack):
    """End-to-end single-batch search vs the per-particle NumPy pipeline."""
    refs = stack[:2].copy()
    imgs = stack[2:]
    n = imgs.shape[0]
    params = AlignParams.zeros(n)
    # nonzero accumulated shifts exercise the += semantics
    acc_sx = np.array([0.0, 1.0, -1.0, 0.0], np.float32)
    acc_sy = np.array([0.0, -1.0, 0.0, 1.0], np.float32)
    params = params._replace(shift_x=jnp.asarray(acc_sx), shift_y=jnp.asarray(acc_sy))

    ref_fw = prepare_ref_spectra(jnp.asarray(refs), cfg)
    for chunk in (1, 4, 25):
        res = rotational_shift_search(jnp.asarray(imgs), ref_fw, params, cfg,
                                      shift_chunk=chunk)
        new = decode_params(res, params, cfg)
        for i in range(n):
            want = oracle.align_particle_np(
                imgs[i].astype(np.float64), refs.astype(np.float64),
                cfg.polar_coords, cfg.ring_weights, cfg.shifts,
                float(acc_sx[i]), float(acc_sy[i]), cfg.shift_limit)
            assert int(new.mirror[i]) == want["mirror"], (chunk, i)
            assert int(new.ref_id[i]) == want["ref_id"], (chunk, i)
            assert abs(float(new.shift_x[i]) - want["shift_x"]) < 1e-4
            assert abs(float(new.shift_y[i]) - want["shift_y"]) < 1e-4
            assert abs(float(new.angle[i]) - want["angle"]) < 5e-3


def test_transform_matches_oracle(stack):
    n = 4
    imgs = stack[:n]
    params = AlignParams(
        angle=jnp.asarray([0.0, 33.0, 122.5, 301.0], jnp.float32),
        shift_x=jnp.asarray([0.0, 1.5, -2.0, 0.5], jnp.float32),
        shift_y=jnp.asarray([0.0, -1.0, 2.5, 0.0], jnp.float32),
        mirror=jnp.asarray([0, 1, 0, 1], jnp.int32),
        ref_id=jnp.zeros((n,), jnp.int32),
    )
    got = np.asarray(transform_batch(jnp.asarray(imgs), params))
    for i in range(n):
        want = oracle.transform_np(imgs[i].astype(np.float64),
                                   float(params.angle[i]),
                                   float(params.shift_x[i]),
                                   float(params.shift_y[i]),
                                   int(params.mirror[i]))
        np.testing.assert_allclose(got[i], want, atol=2e-4)


def test_rot_shift2d_matches_oracle(stack):
    imgs = stack[:3]
    angs = [17.0, 290.0, 45.5]
    dxs = [1.25, -3.0, 0.0]
    dys = [-0.5, 2.0, 4.75]
    mirrors = [0, 1, 1]
    got = np.asarray(rot_shift2d(jnp.asarray(imgs), jnp.asarray(angs),
                                 jnp.asarray(dxs), jnp.asarray(dys),
                                 mirror=jnp.asarray(mirrors)))
    for i in range(3):
        want = oracle.rot_shift2d_np(imgs[i].astype(np.float64), angs[i], dxs[i], dys[i])
        if mirrors[i]:
            want = oracle.mirror_flip_np(want)
        np.testing.assert_allclose(got[i], want, atol=2e-4)


def test_class_sum_oe(stack):
    imgs = jnp.asarray(stack)
    ref_id = jnp.asarray([0, 1, 0, 2, 1, 0], jnp.int32)
    sums, counts = class_sum_oe(imgs, ref_id, 3)
    np.testing.assert_array_equal(np.asarray(counts), [3, 2, 1])
    # class 0 members: 0 (even), 2 (even), 5 (odd)
    np.testing.assert_allclose(np.asarray(sums[0, 0]), stack[0] + stack[2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums[0, 1]), stack[5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums[2, 0]), np.zeros_like(stack[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sums[2, 1]), stack[3], atol=1e-5)


def test_normalize_mask(stack):
    mask = model_circle(24, NX)
    out = np.asarray(normalize_mask(jnp.asarray(stack), jnp.asarray(mask),
                                    no_sigma=True))
    m = mask > 0
    for i in range(len(stack)):
        assert abs(out[i][m].mean()) < 1e-5
    out2 = np.asarray(normalize_mask(jnp.asarray(stack), jnp.asarray(mask),
                                     no_sigma=False))
    for i in range(len(stack)):
        assert abs(out2[i][m].mean()) < 1e-5
        assert abs(out2[i][m].std() - 1.0) < 1e-3


def test_fshift_integer_roundtrip(stack):
    img = stack[0]
    out = np.asarray(fshift(jnp.asarray(img), 3.0, -2.0))
    want = np.roll(np.roll(img, -2, axis=0), 3, axis=1)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_filt_tanl_lowpass(stack):
    img = stack[0]
    out = np.asarray(filt_tanl(jnp.asarray(img), 0.15, 0.1))
    # energy at high frequencies must drop, dc preserved
    f_in = np.abs(np.fft.rfft2(img))
    f_out = np.abs(np.fft.rfft2(out))
    assert abs(f_in[0, 0] - f_out[0, 0]) / f_in[0, 0] < 1e-3
    assert f_out[0, -1] < 0.05 * max(f_in[0, -1], 1e-9)


def test_per_particle_ref_search(cfg, stack):
    """cu_ccf_mult semantics: each particle correlates only with its
    currently assigned reference; the winner must match a full search
    restricted to that reference."""
    import jax.numpy as jnp

    from cryo_ralib_tpu.ops.search import (prepare_ref_spectra,
                                           rotational_shift_search)
    from cryo_ralib_tpu.params import AlignParams

    imgs = jnp.asarray(stack[:4])
    refs = jnp.asarray(stack[4:6].copy()[::-1])  # 2 distinct refs
    rfw = prepare_ref_spectra(refs, cfg)
    n = 4
    rid = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
    params = AlignParams(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                         jnp.zeros(n, jnp.int32), rid)
    res = rotational_shift_search(imgs, rfw, params, cfg, shift_chunk=25,
                                  per_particle_ref=True)
    # compare each particle against a single-ref full search
    for i in range(n):
        one = prepare_ref_spectra(refs[int(rid[i])][None], cfg)
        ri = rotational_shift_search(
            imgs[i:i + 1], one,
            AlignParams(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                        jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32)),
            cfg, shift_chunk=25)
        assert int(res.best_aidx[i]) == int(ri.best_aidx[0])
        assert int(res.best_sidx[i]) == int(ri.best_sidx[0])
        assert int(res.best_mirror[i]) == int(ri.best_mirror[0])


def test_translate_window_matches_full_translate(stack):
    """translate_window_mm == translate_bilinear_mm[window] — exact for
    integer shifts (one-hot tents) in both precisions, bf16-close for
    fractional ones (the template engine's r4 pre-translate)."""
    from cryo_ralib_tpu.ops.polar_mm import (translate_bilinear_mm,
                                             translate_window_mm)

    n = stack.shape[0]
    lo, width = 10, 41
    rng = np.random.default_rng(5)
    for shifts, exact in [
        (rng.integers(-3, 4, (2, n)).astype(np.float32), True),
        (rng.uniform(-2, 2, (2, n)).astype(np.float32), False),
    ]:
        sx, sy = jnp.asarray(shifts[0]), jnp.asarray(shifts[1])
        full = translate_bilinear_mm(jnp.asarray(stack), sx, sy)
        want = np.asarray(full)[:, lo:lo + width, lo:lo + width]
        got_f32 = np.asarray(translate_window_mm(
            jnp.asarray(stack), sx, sy, lo, width, fast=False))
        np.testing.assert_allclose(got_f32, want, atol=1e-5)
        got_bf16 = np.asarray(translate_window_mm(
            jnp.asarray(stack), sx, sy, lo, width, fast=True), np.float32)
        if exact:
            # integer shifts: tents are one-hot, bf16 == cast of exact
            np.testing.assert_array_equal(
                got_bf16, want.astype(jnp.bfloat16).astype(np.float32))
        else:
            np.testing.assert_allclose(got_bf16, want, atol=2e-2,
                                       rtol=2e-2)
