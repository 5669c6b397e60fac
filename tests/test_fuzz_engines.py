"""Differential geometry fuzz: all search engines agree on random configs.

The per-engine parity tests pin a handful of geometries; gate/pad bugs
live in the ones nobody pinned (odd boxes, asymmetric xr/yr, overshooting
fractional steps, small ring counts).  Here seeded-random configurations
sweep the geometry space and every engine whose gate admits the config
must produce the same winners as the exact-semantics gather engine
(modulo bf16 tie-swaps with tiny score gaps, the documented tolerance of
tools/tpu_parity_check.py).

Reference analog: the CUDA core accepts arbitrary img_dim/ring_num/grid
(cuda/gpu_aln_common.h:48-54) with one code path; this library has four
engines and per-engine gates, so agreement must be *tested* across
geometry.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from cryo_ralib_tpu import AlignConfig, AlignParams
from cryo_ralib_tpu.ops.search import (prepare_ref_spectra,
                                       rotational_shift_search,
                                       rotational_shift_search_mm)
from cryo_ralib_tpu.ops.template_search import (template_search,
                                                template_supported)
from tests.conftest import make_disc_stack


def _random_cfg(rng):
    img_dim = int(rng.choice([48, 56, 64, 75, 90]))
    max_ring = img_dim // 2 - 4
    ring_num = int(rng.integers(8, min(24, max_ring)))
    ring_len = int(rng.choice([64, 128, 256]))
    step = float(rng.choice([0.5, 0.75, 1.0, 2.0]))
    xr = float(rng.choice([1.0, 2.0, 3.0]))
    yr = float(rng.choice([0.0, 1.0, xr]))
    mode = str(rng.choice(["F", "H"]))
    mirror = bool(rng.integers(0, 2))
    return AlignConfig(img_dim=img_dim, ring_num=ring_num,
                       ring_len=ring_len, shift_step=step,
                       shift_rng_x=xr, shift_rng_y=yr,
                       mode=mode, mirror=mirror)


def _winners(res, i):
    return (int(res.best_mirror[i]), int(res.best_sidx[i]),
            int(res.best_ref[i]), int(res.best_aidx[i]))


@pytest.mark.parametrize("seed", range(8))
def test_engines_agree_on_random_geometry(seed):
    rng = np.random.default_rng(9000 + seed)
    cfg = _random_cfg(rng)
    n, k = 4, 3
    stack = make_disc_stack(rng, n, cfg.img_dim)
    refs = make_disc_stack(rng, k, cfg.img_dim)
    params = AlignParams.zeros(n)
    ref_fw = prepare_ref_spectra(jnp.asarray(refs), cfg)

    res_g = rotational_shift_search(jnp.asarray(stack), ref_fw, params, cfg)

    others = [("matmul", rotational_shift_search_mm(
        jnp.asarray(stack), ref_fw, params, cfg, fast=False))]
    if template_supported(cfg, k):
        others.append(("template", template_search(
            jnp.asarray(stack), ref_fw, params, cfg)))

    for name, res in others:
        for i in range(n):
            same = _winners(res, i) == _winners(res_g, i)
            gap = abs(float(res.best_val[i]) - float(res_g.best_val[i]))
            tol = 5e-3 * max(abs(float(res_g.best_val[i])), 1e-6)
            assert same or gap < tol, (
                f"{name} disagrees with gather on seed {seed} cfg {cfg} "
                f"particle {i}: {_winners(res, i)} vs {_winners(res_g, i)} "
                f"gap {gap:.3e}")
