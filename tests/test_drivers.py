"""End-to-end driver tests: reffree and mref converge on synthetic data and
produce the reference's output artifacts."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu.models import ali2d_base_tpu, mref_ali2d_tpu
from cryo_ralib_tpu.ops import rot_shift2d
from cryo_ralib_tpu.utils.log import RunLogger
from tests.conftest import make_class_bases, make_disc_stack

NX = 64


def _scattered_stack(rng, n, base):
    """Rotate/shift copies of base images: ground truth for recovery."""
    k = base.shape[0]
    cls = rng.integers(0, k, n)
    angs = rng.uniform(0, 360, n).astype(np.float32)
    sxs = rng.integers(-2, 3, n).astype(np.float32)
    sys_ = rng.integers(-2, 3, n).astype(np.float32)
    imgs = np.array(rot_shift2d(
        jnp.asarray(base[cls]), jnp.asarray(angs), jnp.asarray(sxs),
        jnp.asarray(sys_)))
    imgs += rng.normal(0, 0.02, imgs.shape).astype(np.float32)
    return imgs.astype(np.float32), cls, angs


def test_reffree_driver(tmp_path, rng):
    base = make_disc_stack(rng, 1, NX)
    imgs, _, _ = _scattered_stack(rng, 16, base)
    res = ali2d_base_tpu(imgs, outdir=str(tmp_path), ou=24, xr=2, ts=1,
                         maxit=3, log=RunLogger(None, quiet=True),
                         shift_chunk=25)
    assert res.params.shape == (16, 4)
    assert os.path.exists(tmp_path / "aqc.hdf")
    assert os.path.exists(tmp_path / "aqf.hdf")
    assert os.path.exists(tmp_path / "aqfinal.hdf")
    assert os.path.exists(tmp_path / "initial2Dparams.txt")
    assert os.path.exists(tmp_path / "resolution001")
    # criterion should improve from iteration 1 to the last
    assert res.criteria[-1] >= res.criteria[0] * 0.5
    table = np.loadtxt(tmp_path / "initial2Dparams.txt")
    assert table.shape == (16, 4)


def test_mref_driver(tmp_path, rng):
    base = make_class_bases(3, NX)
    imgs, cls, _ = _scattered_stack(rng, 24, base)
    res = mref_ali2d_tpu(imgs, base.copy(), outdir=str(tmp_path), ou=24,
                         xr=2, yr=2, ts=1, maxit=3,
                         user_func_name="ref_ali2d_no_filter",
                         log=RunLogger(None, quiet=True), shift_chunk=25)
    assert res.params.shape == (24, 4)
    assert res.assignments.shape == (24,)
    assert os.path.exists(tmp_path / "aqm000.hdf")
    assert os.path.exists(tmp_path / "aqm002.hdf")
    # with clean synthetic classes the argmax assignment should recover the
    # generating class for a clear majority of particles
    agreement = (res.assignments == cls).mean()
    assert agreement > 0.7, agreement


def test_mref_driver_sharded(tmp_path, rng):
    """Same driver over the virtual 8-device CPU mesh: results must agree
    with the single-device run."""
    from cryo_ralib_tpu.parallel import make_mesh

    base = make_class_bases(2, NX)
    imgs, cls, _ = _scattered_stack(rng, 18, base)  # 18 pads to 24 on 8 devices
    kw = dict(ou=24, xr=1, yr=1, ts=1, maxit=2,
              user_func_name="ref_ali2d_no_filter",
              log=RunLogger(None, quiet=True), shift_chunk=9)
    res1 = mref_ali2d_tpu(imgs, base.copy(), **kw)
    mesh = make_mesh(8)
    res8 = mref_ali2d_tpu(imgs, base.copy(), mesh=mesh, **kw)
    np.testing.assert_array_equal(res1.assignments, res8.assignments)
    np.testing.assert_allclose(res1.params, res8.params, atol=1e-3)
    np.testing.assert_array_equal(res1.class_counts, res8.class_counts)
