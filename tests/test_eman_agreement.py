"""Quantify assignment agreement between the fixed-256-ring GPU scheme
(this rebuild's primary convention, = the reference CUDA path) and the
EMAN2-convention CPU baseline (variable-length `Numrinit` rings +
`ringwe` weights, test_mref_gpu_align.py:741-750) — the SURVEY.md §3.3
validation contract.  Tolerances documented in docs/design.md.
"""

import numpy as np
import pytest

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.utils.oracle import (align_particle_eman_np,
                                         align_particle_np, numrinit, ringwe)
from cryo_ralib_tpu.utils.synthetic import (asymmetric_templates,
                                            class_templates, scattered_stack)


def test_numrinit_known_values():
    """Hand-checked SPHIRE `Numrinit(1, 4)` plan: jp=round(2*pi*k),
    ip = pow2 <= jp, doubled on >1.5x (inner) / >1.2x (last) overshoot."""
    assert numrinit(1, 4) == [(1, 4), (2, 16), (3, 16), (4, 32)]
    # single ring is its own last ring (1.2x rule): jp=6 > 4+4//5=4 -> 8
    assert numrinit(1, 1) == [(1, 8)]
    # skip=2 changes which ring is "last"
    assert numrinit(1, 5, skip=2) == [(1, 4), (3, 16), (5, 32)]
    # half mode uses dpi=pi: ring 1 jp=3 -> pow2 2, no doubling (3 <= 2+1)
    assert numrinit(1, 2, mode="H") == [(1, 2), (2, 8)]


def test_ringwe_formula():
    rings = numrinit(1, 4)
    wr = ringwe(rings)
    maxrin = rings[-1][1]
    for w, (r, ln) in zip(wr, rings):
        assert w == pytest.approx(r * 2 * np.pi / ln * maxrin / ln)


def test_eman_self_alignment_identity():
    """A reference aligned against itself decodes to ~zero rotation,
    zero shift, no mirror, under the EMAN2 scheme."""
    base = class_templates(1, 64)
    rings = numrinit(1, 20)
    shifts = AlignConfig(img_dim=64, ring_num=20, shift_rng_x=1.0,
                         shift_rng_y=1.0).shifts.astype(np.float64)
    out = align_particle_eman_np(base[0], base, rings, shifts)
    assert out["ref_id"] == 0 and out["mirror"] == 0
    ang = min(out["angle"], 360.0 - out["angle"])
    assert ang < 1.0
    assert out["shift_x"] == 0.0 and out["shift_y"] == 0.0


def test_assignment_agreement_fixed_vs_eman():
    """Class assignment + mirror agreement of the fixed-256 scheme vs the
    EMAN2-convention baseline on structured (symmetry-broken) data:
    >= 0.9 assignment agreement (docs/design.md), mirrors of agreeing
    particles match, angles within 2 deg median (the two schemes sample
    different ring geometries, so interpolated angles differ at the
    sub-degree level, not the class level)."""
    k, nx, n = 3, 64, 24
    base = asymmetric_templates(k, nx)
    imgs, cls, angles, shifts_true = scattered_stack(base, n, max_shift=2,
                                                     seed=11)
    noisy = (imgs + np.random.default_rng(5).normal(0, 0.08, imgs.shape)
             ).astype(np.float32)
    cfg = AlignConfig(img_dim=nx, ring_num=20, ring_len=256, shift_step=1.0,
                      shift_rng_x=2.0, shift_rng_y=2.0)
    rings = numrinit(1, 20)
    shift_grid = cfg.shifts.astype(np.float64)

    agree_ref = agree_mir = 0
    ang_diffs = []
    for i in range(n):
        a = align_particle_np(noisy[i], base, cfg.polar_coords,
                              cfg.ring_weights, shift_grid, 0.0, 0.0,
                              cfg.shift_limit)
        b = align_particle_eman_np(noisy[i], base, rings, shift_grid,
                                   shift_limit=cfg.shift_limit)
        agree_ref += a["ref_id"] == b["ref_id"]
        if a["ref_id"] == b["ref_id"]:
            agree_mir += a["mirror"] == b["mirror"]
            if a["mirror"] == b["mirror"]:
                d = abs(a["angle"] - b["angle"])
                ang_diffs.append(min(d, 360.0 - d))
    assert agree_ref / n >= 0.9, f"ref agreement {agree_ref}/{n}"
    assert agree_mir >= 0.9 * agree_ref, f"mirror {agree_mir}/{agree_ref}"
    assert np.median(ang_diffs) < 2.0, ang_diffs
