"""End-to-end stage ablation for ``align_step`` at arbitrary geometry.

`tools/fused_ablate.py` ranks stages INSIDE the fused search kernel;
this tool ranks the stages AROUND it — the e2e step decomposes as

    prepare_ref_spectra -> search -> decode_params ->
    class_sum_transform_mm -> header sums

and the kernel-vs-e2e gap grows with box area (VERDICT r3 weak #4:
160 px measured 37k pps kernel-only vs 22.6k e2e).  The prime suspect
is the FFT-shear transform + class sums: `_warp_spectrum` pads to the
next 128 multiple of ceil(sqrt(2) * box) — 128 at 90 px but 256 at
160 px, so the transform's HBM traffic quadruples while the search
grows only with ring count.

Not a test.  Run on the TPU machine:

    timeout 560 python tools/e2e_ablate.py [stage...] [--nx=160] [--n=2048]

Stages (each timed as its own jitted program, median of 3, host-fetch
forced): full (align_step), search (prepare+search+decode only),
sums (class_sum_transform_mm alone on decoded params), prep
(prepare_ref_spectra alone).  Deltas are not additive (XLA overlaps);
use them to rank.

r4 calibrated map (one v5e chip, N=2048, K=4, 160 px ou=48 xr=yr=2,
fused; null row = 25.6 ms pure dispatch tax, subtracted): full
~54.5 ms compute, search+decode ~24.6, sums ~28.3, prep ~0 — the
stages add exactly, and the transform + class-sum stage costs MORE
than the search at this box (pad-area model: 160 px pads to 256, 4x
the 90 px transform traffic, while the search grows only with ring
count).  Two consequences landed in r4: the bench's 160 px row moved
to batch 8192 (at 2048 the ~26 ms dispatch tax alone was ~31% of the
row), and the 160 px "kernel vs e2e gap" is attributed — it is the
warp, not overhead, and its floor is real (below).  Uncalibrated
timing pitfalls hit twice while building this tool: a host fetch of
the (K, 2, 160, 160) sums inflated that row 2x (~30 MB/s tunnel), and
jitting a first-leaf-only force let XLA dead-code the entire class-sum
stage (full == search).  The production fix: reduce every output leaf
to one scalar inside the jitted program.

Graveyard (measured wrong, reverted): merging shear pass 1 (uniform
y-translate syr) into passes 2/3 by argument compensation
(t'(y) = a(y-cp-syr)+sxr, g'(x) = b(x-cp)+syr) — the continuous-
coordinate substitution identity does NOT hold for the discrete chained
ops: the row-dependent x-translate is diagonal in (y-space, x-freq),
the column translate in (y-freq, x-space), so they do not commute;
sinc interpolation along y mixes rows carrying different x-shifts.
Direct check measured max|d| = 3.1 on white noise (pad 128, 17 deg,
shifts ~2) — the 3-pass order is load-bearing, not an optimization
target.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.models.steps import align_step
from cryo_ralib_tpu.ops.classavg import class_sum_transform_mm
from cryo_ralib_tpu.ops.search import decode_params, prepare_ref_spectra
from cryo_ralib_tpu.params import AlignParams


def _time(fn, *args, reps=3):
    """Time ``fn`` via a wrapper that returns only a tiny dependent real
    slice — one dispatch, ~32-byte fetch (axon: block_until_ready does
    not block; complex fetches are UNIMPLEMENTED; every dispatch costs
    ~15-30 ms RTT, so the 'null' row calibrates the fixed tax)."""
    def tiny(*a):
        # reduce EVERY leaf fully — slicing just one lets XLA dead-code
        # the rest of the program (measured: full == search-only)
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(jnp.real(l).astype(jnp.float32)) for l in leaves)

    fnw = jax.jit(tiny)
    np.asarray(fnw(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fnw(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def main():
    kw = {a.split("=")[0][2:]: int(a.split("=")[1])
          for a in sys.argv[1:] if a.startswith("--")}
    stages = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "full", "search", "sums", "prep", "null"]
    nx = kw.get("nx", 160)
    n = kw.get("n", 2048)
    k = kw.get("k", 4)
    # small boxes: largest radius that passes AlignConfig's boundary
    # check with shift_rng=2 (max_radius + shift_rng <= (nx-1)//2)
    ou = kw.get("ou", (nx - 1) // 2 - 2 if nx <= 96
                else 48 if nx == 160 else 100)
    sampler = {90: "fused", 160: "fused"}.get(nx, "template")

    cfg = AlignConfig(img_dim=nx, ring_num=ou, ring_len=256,
                      shift_step=1.0, shift_rng_x=2.0, shift_rng_y=2.0)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((n, nx, nx)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((k, nx, nx)).astype(np.float32))
    params = AlignParams.zeros(n)
    gidx = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones((n,), jnp.float32)
    print(f"nx={nx} n={n} k={k} ou={ou} sampler={sampler}", flush=True)

    def search_only(i, r):
        rfw = prepare_ref_spectra(r, cfg)
        if sampler == "fused":
            from cryo_ralib_tpu.ops.fused_search import fused_search
            res = fused_search(i, rfw, params, cfg)
        else:
            from cryo_ralib_tpu.ops.template_search import template_search
            res = template_search(i, rfw, params, cfg)
        return decode_params(res, params, cfg)

    decoded = jax.jit(search_only)(imgs, refs)

    fns = {
        "full": (jax.jit(lambda i, r: align_step(
            i, r, params, gidx, valid, cfg, n_classes=k, sampler=sampler)),
            (imgs, refs)),
        "search": (jax.jit(search_only), (imgs, refs)),
        "sums": (jax.jit(lambda i, p: class_sum_transform_mm(
            i, p, k, global_index=gidx, valid=valid)), (imgs, decoded)),
        "prep": (jax.jit(lambda r: prepare_ref_spectra(r, cfg)), (refs,)),
        "null": (jax.jit(lambda r: r * 2.0), (valid,)),
    }
    for s in stages:
        fn, args = fns[s]
        ms = _time(fn, *args)
        print(f"{s:8s}: {ms:7.1f} ms  ({n / ms * 1e3:8.0f} pps)", flush=True)


if __name__ == "__main__":
    main()
