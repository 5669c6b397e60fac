"""Checkpoint/resume: a run interrupted after 2 iterations and resumed for
2 more must equal an uninterrupted 4-iteration run."""

import shutil

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cryo_ralib_tpu.models import ali2d_base_tpu, mref_ali2d_tpu
from cryo_ralib_tpu.utils.log import RunLogger
from cryo_ralib_tpu.utils.synthetic import class_templates, scattered_stack


def test_mref_resume_matches_straight_run(tmp_path):
    base = class_templates(3, 64)
    imgs, cls, _, _ = scattered_stack(base, 24, max_shift=1, seed=5)
    kw = dict(ou=24, xr=1, yr=1, ts=1,
              user_func_name="ref_ali2d_no_filter",
              log=RunLogger(None, quiet=True), sampler="gather")

    d_full = tmp_path / "full"
    res_full = mref_ali2d_tpu(imgs, base.copy(), outdir=str(d_full),
                              maxit=4, **kw)

    d_part = tmp_path / "part"
    mref_ali2d_tpu(imgs, base.copy(), outdir=str(d_part), maxit=2, **kw)
    res_resumed = mref_ali2d_tpu(imgs, base.copy(), outdir=str(d_part),
                                 maxit=4, resume=True, **kw)

    np.testing.assert_array_equal(res_full.assignments,
                                  res_resumed.assignments)
    np.testing.assert_allclose(res_full.params, res_resumed.params, atol=1e-4)
    np.testing.assert_allclose(res_full.references, res_resumed.references,
                               atol=1e-4)


def test_reffree_resume_continues(tmp_path):
    base = class_templates(1, 64)
    imgs, _, _, _ = scattered_stack(base, 16, max_shift=1, seed=7)
    kw = dict(ou=24, xr=1, ts=1, log=RunLogger(None, quiet=True),
              sampler="gather")

    d_full = tmp_path / "full"
    res_full = ali2d_base_tpu(imgs, outdir=str(d_full), maxit=4, **kw)

    d_part = tmp_path / "part"
    ali2d_base_tpu(imgs, outdir=str(d_part), maxit=2, **kw)
    res_res = ali2d_base_tpu(imgs, outdir=str(d_part), maxit=4, resume=True,
                             **kw)
    np.testing.assert_allclose(res_full.params, res_res.params, atol=1e-4)
    np.testing.assert_allclose(res_full.average, res_res.average, atol=1e-4)


def test_resume_without_checkpoint_is_fresh(tmp_path):
    base = class_templates(2, 64)
    imgs, _, _, _ = scattered_stack(base, 12, max_shift=1, seed=9)
    d = tmp_path / "out"
    d.mkdir()
    res = mref_ali2d_tpu(imgs, base.copy(), outdir=str(d), maxit=1,
                         ou=24, xr=1, yr=1, ts=1, resume=True,
                         user_func_name="ref_ali2d_no_filter",
                         log=RunLogger(None, quiet=True), sampler="gather")
    assert res.params.shape == (12, 4)
    shutil.rmtree(d)
