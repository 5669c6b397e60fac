"""SCF (self-correlation) alignment: JAX path vs oracle + end-to-end.

``random_method="SCF"`` is the CPU twin's scf-based alignment
(test_reffree_gpu_align.py:714 forces mode="H"; the SPHIRE
``multalign2d_scf`` it dispatches to is outside the reference repo —
the semantics contract is ``utils.oracle.align_particle_scf_np``,
mirrored by ``ops/scf.py``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu import AlignConfig, AlignParams
from cryo_ralib_tpu.ops.scf import scf_align, scf_batch
from cryo_ralib_tpu.utils import oracle
from tests.conftest import make_disc_stack

NX = 64


def _cfg(**kw):
    base = dict(img_dim=NX, ring_num=20, ring_len=128,
                shift_step=1.0, shift_rng_x=2.0, shift_rng_y=2.0,
                mode="H")
    base.update(kw)
    return AlignConfig(**base)


@pytest.fixture(scope="module")
def stack():
    r = np.random.default_rng(63)
    return make_disc_stack(r, 6, NX)


def test_scf_np_properties(stack):
    img = stack[0].astype(np.float64)
    s = oracle.scf_np(img)
    # translation invariance is exact for circulant shifts
    s_sh = oracle.scf_np(np.roll(img, (3, -5), axis=(0, 1)))
    np.testing.assert_allclose(s, s_sh, atol=1e-10)
    # centrosymmetric about the center pixel; DC peak at the center
    su = np.fft.ifftshift(s)
    np.testing.assert_allclose(
        su, su[(-np.arange(NX)) % NX][:, (-np.arange(NX)) % NX], atol=1e-10)
    assert np.unravel_index(np.argmax(s), s.shape) == (NX // 2, NX // 2)
    # rotation equivariance: scf of a rotated image is the rotated scf
    rot = oracle.transform_np(img, 90.0, 0.0, 0.0, 0)
    s_rot = oracle.scf_np(rot)
    # compare away from the boundary (transform_np clamps edges)
    c = slice(8, NX - 8)
    np.testing.assert_allclose(
        s_rot[c, c], oracle.transform_np(s, 90.0, 0.0, 0.0, 0)[c, c],
        atol=1e-2 * np.abs(s).max())


def test_scf_batch_matches_oracle(stack):
    dev = np.asarray(scf_batch(jnp.asarray(stack)))
    for i in range(stack.shape[0]):
        want = oracle.scf_np(stack[i].astype(np.float64))
        np.testing.assert_allclose(dev[i], want, atol=2e-3 * np.abs(want).max())


def test_scf_align_matches_oracle(stack):
    cfg = _cfg()
    ref = stack.mean(0)
    params, peak = scf_align(jnp.asarray(stack), jnp.asarray(ref), cfg)
    for i in range(stack.shape[0]):
        want = oracle.align_particle_scf_np(
            stack[i].astype(np.float64), ref.astype(np.float64),
            cfg.polar_coords, cfg.ring_weights,
            int(cfg.shift_rng_x), int(cfg.shift_rng_y), cfg.shift_limit)
        assert int(params.mirror[i]) == want["mirror"], i
        assert abs(float(params.shift_x[i]) - want["shift_x"]) < 1e-6, i
        assert abs(float(params.shift_y[i]) - want["shift_y"]) < 1e-6, i
        da = abs(float(params.angle[i]) - want["angle"]) % 360.0
        assert min(da, 360.0 - da) < 0.1, i
        assert abs(float(peak[i]) - want["peak"]) < 1e-3 * abs(want["peak"])


def test_scf_translation_identity():
    """The rotate-the-reference trick equals the direct score: for exact
    (90-degree, integer-shift) transforms of zero-border images,
    sum_y ref(y) transform(img, A, s, m)(y) == sum_z invref(z) img(z+s)."""
    r = np.random.default_rng(11)
    ref = np.zeros((NX, NX))
    ref[16:48, 16:48] = r.standard_normal((32, 32))
    for m in (0, 1):
        for ang in (90.0, 180.0):
            img = r.standard_normal((NX, NX))
            img[:8] = img[-8:] = 0.0
            img[:, :8] = img[:, -8:] = 0.0
            sx, sy = 2, -1
            lhs = np.sum(ref * oracle.transform_np(img, ang, sx, sy, m))
            inv_ang = ang if m else -ang
            invref = oracle.transform_np(ref, inv_ang, 0.0, 0.0, m)
            rhs = np.sum(invref * np.roll(img, (-sy, -sx), axis=(0, 1)))
            assert abs(lhs - rhs) < 1e-6 * max(abs(lhs), 1.0), (m, ang)


@pytest.mark.parametrize("m", [0, 1])
def test_scf_recovers_known_transform(m):
    """A rotated+shifted(+mirrored) copy of the reference aligns back:
    transform(img, recovered_params) correlates with the reference."""
    base = make_disc_stack(np.random.default_rng(7), 1, NX)[0]
    cfg = _cfg()
    img = oracle.transform_np(base.astype(np.float64), 57.0, 1.0, -2.0,
                              m).astype(np.float32)
    params, _ = scf_align(jnp.asarray(img[None]), jnp.asarray(base), cfg)
    assert int(params.mirror[0]) == m
    from cryo_ralib_tpu.ops.transform import transform_batch

    aligned = np.asarray(transform_batch(jnp.asarray(img[None]), params))[0]
    mask = np.zeros((NX, NX)); mask[8:-8, 8:-8] = 1.0
    a = (aligned * mask).ravel(); b = (base * mask).ravel()
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.9, (r, np.asarray(params.angle), np.asarray(params.shift_x))


def test_scf_step_and_engine(stack):
    from cryo_ralib_tpu.models.engine import AlignmentEngine

    cfg = _cfg()
    eng = AlignmentEngine(stack, cfg, n_classes=1, update_ref=False,
                          sampler="gather", random_method="SCF")
    out = eng.iterate(stack.mean(0)[None])
    assert out.counts.sum() == stack.shape[0]
    assert np.all(np.isfinite(out.class_sums))
    p = eng.params_np()
    assert np.all((np.asarray(p.mirror) == 0) | (np.asarray(p.mirror) == 1))


def test_reffree_driver_scf(tmp_path, stack):
    from cryo_ralib_tpu.models.reffree import ali2d_base_tpu

    big = np.concatenate([stack, stack[::-1] * 0.7], axis=0)
    res = ali2d_base_tpu(big, outdir=str(tmp_path / "scf"), ou=20,
                         xr=1.0, ts=1.0, maxit=2, random_method="SCF",
                         sampler="gather",
                         user_func_name="ref_ali2d_no_filter")
    assert res.iterations >= 1
    assert res.params.shape == (big.shape[0], 4)
