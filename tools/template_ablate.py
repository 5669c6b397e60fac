"""Stage-timing benchmark for the template-matmul search engine.

Times `template_search` (ops/template_search.py) end to end and its
stages in isolation, to rank bottlenecks before touching the engine —
the same measure-first protocol as tools/fused_ablate.py.  The search
matmul is ~2.6 GFLOP/particle of pure bf16 `dot_general`
(prototype-measured 155 ms / 8192 particles = ~71% of v5e bf16 peak),
so the interesting questions are (a) how much the template build, the
pre-translate and the argmax/row-capture add on top, and (b) whether a
different column-chunk size moves the matmul closer to peak.

Not a test.  Run on the TPU machine:

    timeout 560 python tools/template_ablate.py [stages...]

Stages:
  full        template_search end to end (the production path)
  full_stream template_search with stream=True (no materialized matrix
              — the large-K path; compare against full to decide the
              auto-stream threshold)
  build       build_template_matrix only (refs -> (C, Wpx) bf16)
  sf          splat_spectra only (cfg-static; loops hoist it)
  translate   pre-translate + window + bf16 cast of the stack
  search      _argmax_chunked on device-resident (win, tm) — the
              matmul+argmax+row-capture block alone
  search_cN   same with COL_CHUNK_TARGET=N (e.g. search_c1024,
              search_c4096, search_c8192) to tune the chunk size
  mm_only     the chunked score matmul with only a running jnp.max
              epilogue (no argmax, no row capture) — the pure-matmul
              floor of the search stage
  mm_argmax   matmul + max + argmax per chunk, no row capture —
              isolates the one-hot angle-row capture cost

Every timing uses a host fetch as the completion barrier
(jax.block_until_ready does not block on the axon transport) and
includes the ~44 ms tunnel dispatch cost; compare stages to each
other, not to zero.

Measured on v5e (90 px, K=8, S=49, N=8192, post-r3-outage).  NB: the
first four rows and the mm_* rows come from two separate sessions on a
shared host — compare within a group; cross-group deltas carry a few ms
of rerun noise (ADVICE r3: 175.6 - 151.8 = 23.8 ms is NOT the epilogue
cost; the same-session mm_argmax/search deltas below are):

  full 182 ms (45.0k pps), search 175.6, build 48.6, translate ~77
  (stages share the dispatch cost; the production path hoists sf)
  mm_only 151.8 ms  -> the score matmul alone runs at ~72% of bf16
                       peak and dominates the search stage
  mm_argmax ~+6 ms over mm_only (same session), full epilogue (argmax +
            one-hot row capture) ~+11 ms over mm_only (same session)
            -> the epilogue is NOT the lever
  search_c2560 ~3% under c2048 once, within rerun noise -> chunk
            target stays 2048
  (negative) a minor-axis jnp.take of the (8192, 6561) window at
            this size never finished compiling+running inside 580 s
            on the tunneled worker -> pixel packing must be built
            from contiguous slices, not gathers

  (r4, large-K) k=32 n=4096 full: 334.0 ms (12.3k pps) vs the fused
            kernel's 136.8 ms (29.9k) in the same session — the
            template engine is NOT a large-K alternative (its matmul
            FLOPs scale linearly in K from a ~100x-larger base than
            the fused VPU accumulate); its role stays GSPMD
            partitionability and >128 px boxes.

  (negative, r4) mm_pad 159.8 ms vs mm_only 149.9 same-session: zero-
            padding both operands' contraction dim to the next 128
            multiple (6561 -> 6656) is exact but SLOWER (+6.6% for
            +1.4% FLOPs) — the misaligned minor dim costs nothing on
            this backend; ~72-73% of bf16 peak is the ceiling for this
            shape, not an alignment artifact.

Conclusion: the only real lever left in the search stage is cutting
matmul FLOPs themselves — e.g. dropping the ~21% of window pixels
outside the ring+shift support disc (square-corner pixels), which
every template column leaves at exact zero (splat spectra are exact
zeros there and the matmul-irfft of zeros is zero).

(negative, tried and measured) Disc packing — dropping those pixels
by concatenating per-row [x0, x1) span slices (81 spans, 6561 -> 5217
px at the headline config) from both the window and the template
columns — is semantically exact (CPU tests green, dropped template
pixels exactly 0) and the naive form measured full 162 ms / search
134 ms (-24%, 50.5k pps e2e).  But on this backend it is
unshippable; every formulation was tried on hardware:
  * pack fused into the template build (the fast form): MISCOMPILES
    — wrong pixels land in ~95% of columns, winners garbage; caught
    by tools/tpu_parity_check.py (template engine FAILed all 4 cases
    with max|d| = the max template value).  An optimization_barrier
    before the pack does NOT fix it; a barrier AFTER the pack does
    not either (probed max|d|=1.7e2).
  * correct forms (barrier'd slice from the materialized padded
    blocks, or stack-then-pack of the full TM) compile and are exact
    but take 19-26 s warm: ~5k lane-misaligned concat pieces (span
    starts at arbitrary lane offsets) each degrade to strided
    scalar-ish copies.
  * packing on the sublane axis instead — the (K, Wpx, L) layout
    from irfft_mm with angle on lanes, padded-flat pixel spans so
    every shift is one base offset — never finished compiling in
    580 s (4k slice_in_dim ops).
  * a flat jnp.take pack never finished compiling either (above).
The window-side pack alone is exact and cheap (slices from a
materialized translate output) — it is the template side that has no
correct-and-fast lowering.  Revisit only if the backend's concat
lowering improves; rerun the parity gate on hardware first.
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.ops.search import prepare_ref_spectra
from cryo_ralib_tpu.params import AlignParams

ts = importlib.import_module("cryo_ralib_tpu.ops.template_search")

NX, K, N = 90, 8, 8192
OU, XR = 36, 3.0
SCHEME = "cuda"
cfg = AlignConfig(img_dim=NX, ring_num=36, ring_len=256, shift_step=1.0,
                  shift_rng_x=3.0, shift_rng_y=3.0)


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jnp.real(x)) if hasattr(x, "dtype") else x, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(jnp.real(x)) if hasattr(x, "dtype") else x,
            out)
    return (time.perf_counter() - t0) / reps


def main():
    global K, N, NX, OU, XR, SCHEME, cfg
    # optional overrides ahead of the stage names: k=32 n=4096 (large-K
    # stage timing, same spelling as tools/fused_ablate.py), plus
    # nx=256 ou=100 xr=2 (big-box geometry — the VERDICT r4 next #3
    # 256 px stage map) and scheme=eman2 (the r5 eman2 template build)
    stage_args = []
    for a in sys.argv[1:]:
        if a.startswith("k="):
            K = int(a[2:])
        elif a.startswith("n="):
            N = int(a[2:])
        elif a.startswith("nx="):
            NX = int(a[3:])
        elif a.startswith("ou="):
            OU = int(a[3:])
        elif a.startswith("xr="):
            XR = float(a[3:])
        elif a.startswith("scheme="):
            SCHEME = a[7:]
        else:
            stage_args.append(a)
    sys.argv[1:] = stage_args
    kw = dict(img_dim=NX, ring_num=OU, shift_step=1.0,
              shift_rng_x=XR, shift_rng_y=XR, ring_scheme=SCHEME)
    if SCHEME == "cuda":
        kw["ring_len"] = 256
    cfg = AlignConfig(**kw)
    print(f"K={K} N={N} nx={NX} ou={OU} xr={XR} scheme={SCHEME} "
          f"ring_len={cfg.ring_len}", flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((N, NX, NX)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((K, NX, NX)).astype(np.float32))
    params = AlignParams.zeros(N)
    if SCHEME == "eman2":
        from cryo_ralib_tpu.ops.eman_search import prepare_ref_spectra_eman

        rfw = jax.jit(lambda r: prepare_ref_spectra_eman(r, cfg))(refs)
    else:
        rfw = jax.jit(lambda r: prepare_ref_spectra(r, cfg))(refs)
    lo, width, _ = ts.template_geometry(cfg)

    from cryo_ralib_tpu.ops.polar_mm import (translate_bilinear_mm,
                                             translate_window_mm)

    def _win(images):
        # the production r4 pre-translate: window-restricted bf16 tents
        w = translate_window_mm(images, params.shift_x, params.shift_y,
                                lo, width)
        return w.reshape(images.shape[0], -1).astype(jnp.bfloat16)

    def _win_r3(images):
        # the r3 full-image f32-HIGHEST translate + slice (stage
        # "translate_r3"), kept for the before/after record
        img_t = translate_bilinear_mm(images, params.shift_x, params.shift_y)
        w = img_t[:, lo:lo + width, lo:lo + width]
        return w.reshape(images.shape[0], -1).astype(jnp.bfloat16)

    modes = sys.argv[1:] or ["full", "build", "sf", "translate", "search"]
    # device-resident inputs for the search-only stages (built once)
    win_d = tm_d = None
    for mode in modes:
        if mode == "full":
            fn = jax.jit(lambda i, r: ts.template_search(i, r, params, cfg))
            dt = _time(lambda i, r: fn(i, r).best_val, imgs, rfw)
        elif mode == "full_hoist":
            # r5: splat spectra hoisted to a device-resident pytree
            # passed as a runtime ARGUMENT (what make_align_step does
            # via _SfStep — a closed-over array would be constant-folded
            # through a host fetch, which is UNIMPLEMENTED for complex64
            # on this transport); the per-call sf rebuild measured
            # ~150 ms at 256 px
            sf_d = jax.jit(lambda: ts.splat_spectra_groups(cfg))()
            fn = jax.jit(lambda i, r, s: ts.template_search(
                i, r, params, cfg, sf=s))
            dt = _time(lambda i, r: fn(i, r, sf_d).best_val, imgs, rfw)
        elif mode == "full_stream":
            fn = jax.jit(lambda i, r: ts.template_search(i, r, params, cfg,
                                                         stream=True))
            dt = _time(lambda i, r: fn(i, r).best_val, imgs, rfw)
        elif mode == "full_stream_hoist":
            # stream + hoist: skips BOTH the per-call sf rebuild and the
            # materialized (C, Wpx) matrix write/read (~4.4 GB at 256 px)
            sf_d = jax.jit(lambda: ts.splat_spectra_groups(cfg))()
            fn = jax.jit(lambda i, r, s: ts.template_search(
                i, r, params, cfg, stream=True, sf=s))
            dt = _time(lambda i, r: fn(i, r, sf_d).best_val, imgs, rfw)
        elif mode == "build":
            fn = jax.jit(lambda r: ts.build_template_matrix(r, cfg))
            dt = _time(lambda r: fn(r)[:8, :8], rfw)
        elif mode == "sf":
            fn = jax.jit(lambda: ts.splat_spectra(cfg))
            dt = _time(lambda: fn()[:2, :2, :2])
        elif mode == "translate":
            fn = jax.jit(_win)
            dt = _time(lambda i: fn(i)[:8, :8], imgs)
        elif mode == "translate_r3":
            fn = jax.jit(_win_r3)
            dt = _time(lambda i: fn(i)[:8, :8], imgs)
        elif mode in ("mm_only", "mm_argmax", "mm_pad"):
            if win_d is None:
                win_d = jax.jit(_win)(imgs)
                tm_d = jax.jit(
                    lambda r: ts.build_template_matrix(r, cfg))(rfw)
                np.asarray(win_d[:1, :1].astype(jnp.float32))
                np.asarray(tm_d[:1, :1].astype(jnp.float32))
            capture = mode == "mm_argmax"
            if mode == "mm_pad":
                # lane-align the contraction dim (Wpx 6561 -> next 128
                # multiple) with zero columns — semantically exact; probes
                # whether the misaligned minor dim costs MXU efficiency
                wpx = win_d.shape[1]
                wpad = (-wpx) % 128
                win_p = jnp.pad(win_d, ((0, 0), (0, wpad)))
                tm_p = jnp.pad(tm_d, ((0, 0), (0, wpad)))
                np.asarray(win_p[:1, :1].astype(jnp.float32))
                np.asarray(tm_p[:1, :1].astype(jnp.float32))
            else:
                win_p, tm_p = win_d, tm_d

            def _mm(w, t, capture=capture):
                c_total = t.shape[0]
                chunk = ts._col_chunk(c_total, cfg.ring_len)

                def body(i, carry):
                    bv, bi = carry
                    cols = jax.lax.dynamic_slice(
                        t, (i * chunk, 0), (chunk, t.shape[1]))
                    scores = jnp.dot(w, cols.T,
                                     preferred_element_type=jnp.float32)
                    v = jnp.max(scores, axis=1)
                    if capture:
                        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
                        take = v > bv
                        return (jnp.where(take, v, bv),
                                jnp.where(take, a + i * chunk, bi))
                    return (jnp.maximum(bv, v), bi)

                init = (jnp.full((w.shape[0],), -jnp.inf, jnp.float32),
                        jnp.zeros((w.shape[0],), jnp.int32))
                return jax.lax.fori_loop(0, c_total // chunk, body, init)

            fn = jax.jit(_mm)
            dt = _time(lambda w, t: fn(w, t)[0], win_p, tm_p)
        elif mode == "search" or (mode.startswith("search_c")
                                  and mode[8:].isdigit()):
            target = int(mode[8:]) if mode.startswith("search_c") else None
            if win_d is None:
                win_d = jax.jit(_win)(imgs)
                tm_d = jax.jit(
                    lambda r: ts.build_template_matrix(r, cfg))(rfw)
                np.asarray(win_d[:1, :1].astype(jnp.float32))
                np.asarray(tm_d[:1, :1].astype(jnp.float32))
            old = ts.COL_CHUNK_TARGET
            if target:
                ts.COL_CHUNK_TARGET = target
            try:
                fn = jax.jit(lambda w, t: ts._argmax_chunked(
                    w, t, cfg.ring_len))
                dt = _time(lambda w, t: fn(w, t)[0], win_d, tm_d)
            finally:
                ts.COL_CHUNK_TARGET = old
        else:
            print(f"unknown stage {mode}")
            continue
        print(f"{mode:12s}: {dt*1e3:7.1f} ms  ({N/dt:8.0f} pps)", flush=True)


if __name__ == "__main__":
    main()
