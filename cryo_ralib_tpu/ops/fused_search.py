"""Fused Pallas search kernels: the whole per-iteration hot loop in VMEM.

The XLA fast path (ops/search.py) is already gather-free, but every
stage round-trips its intermediate through HBM — the measured cost is
bandwidth, not FLOPs.  These kernels keep the reference's entire
``mref_align_run`` pipeline (cuda/gpu_aln_noref.cu:389-416) on-chip:

One kernel (grid: particle tiles x ring blocks) runs, per ring block,
tent-matmul polar sampling for every (dx, dy) grid shift, the matmul
ring DFT, and the conj-multiply ccf accumulation against every
reference (mirror via the conjugate trick), holding the ccf spectra in
VMEM scratch across ring blocks; the last block then applies the matmul
inverse DFT to all (mirror, shift, ref) rows and takes the flat argmax
in the reference's priority order (mirror, xi, yi, ref, angle) with
first-seen tie breaking (CcfResultTable layout,
cuda/gpu_aln_noref.cu:2172-2178).  The only HBM output is one packed
384-lane row per particle: peak value, angle bin, priority index and
the winning 256-angle row for the parabolic refinement.

Frequency-axis layout (banded kernel, the default): re bins 0..127 in
lanes [0:128] and im bins 0..127 in lanes [128:256] — a tight 256-lane
packing.  The Nyquist bin (128) is real for real ring samples and
identical for the original and mirrored ccf channels
(conj(S)R and conj(SR) agree at Nyquist), so it rides a per-ring
sidecar accumulator (lanes = rings) and is added back exactly at
finalize as one small matmul + rank-1 updates.  This halves the ccf
VPU work and accumulator traffic vs the r1 512-lane zero-padded layout
(measured 333 ms -> 220 ms per 8192x(K=8,S=49) search on v5e).
Sampling/DFT matmuls run bf16 x bf16 -> f32 (MXU native); the y-tent
contraction and ccf accumulation are f32.

The kernel body carries static ``stage`` flags ("full" in production;
"no_ccf"/"no_yred"/"sample_only" for tools/fused_ablate.py) so the
ablation harness times the real kernel, not a hand-copied twin, and a
static ``do_mirror`` flag: ``--nomirror`` searches drop the mirrored
channel entirely (half the ccf work and accumulator scratch).

(The r1 512-lane unbanded kernel was removed in r3 — it shared the
banded VMEM gate while needing twice the scratch, ADVICE r2.)
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AlignConfig
from ..params import AlignParams
from .dft import _irfft_mats, _rfft_mats
from .polar_mm import build_polar_tables, translate_bilinear_mm
from .search import SearchResult

_NEG = -3.0e38
L = 256      # ring_len the kernels are specialized to
F = 129      # rfft bins
FP = 256     # padded frequency lanes
NT = 8       # particles per tile (dynamic VMEM row offsets must be 8-aligned)


def _pad_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=None)
def _dft_tight():
    """(256, 384) bf16: [0:128] cos bins 0..127, [128:256] sin bins
    0..127, col 256 = cos bin 128 (Nyquist), rest zero."""
    c, s = _rfft_mats(L)
    out = np.zeros((L, 384), np.float32)
    out[:, :128] = c[:, :128]
    out[:, 128:256] = s[:, :128]
    out[:, 256] = c[:, 128]
    return out.astype(jnp.bfloat16)


@lru_cache(maxsize=None)
def _irfft_tight():
    """(256, 256) bf16: rows [0:128] = Cr bins 0..127, rows [128:256] =
    Ci bins 0..127 (the Nyquist row is applied separately)."""
    cr, ci = _irfft_mats(L)
    out = np.zeros((256, L), np.float32)
    out[:128] = cr[:128]
    out[128:] = ci[:128]
    return out.astype(jnp.bfloat16)


def _class_plan(cfg, hp: int, rpb: int, n_classes: int = 3):
    """Partition ring blocks into contiguous classes with a uniform
    (8-aligned, center-symmetric) y-band per class, plus the two
    half-plane chunk windows within the band.

    The natural angle order splits every ring at lane 128: samples
    j in [0:128) have sin(theta) >= 0 (rows >= cy), j in [128:256)
    sin(theta) <= 0 — so the y-tent contraction for each 128-lane chunk
    only needs roughly half the class band.  Entries:
    (start, sz, y0, bh, a_off, a_wh, b_off, b_wh) with the chunk
    windows 8-aligned and relative to y0."""
    cy = cfg.img_dim // 2
    dy_max = float(np.max(np.abs(cfg.shift_y_vals)))
    nrb = cfg.ring_num // rpb
    n_classes = min(n_classes, nrb)
    base = nrb // n_classes
    sizes = [base] * n_classes
    sizes[-1] += nrb - base * n_classes
    classes = []
    start = 0
    for sz in sizes:
        rmax = (start + sz) * rpb            # largest radius in the class
        lo = max(0, int(np.floor(cy - rmax - dy_max - 1)))
        hi = min(hp, int(np.ceil(cy + rmax + dy_max + 2)))
        lo = (lo // 8) * 8
        hi = min(hp, ((hi + 7) // 8) * 8)
        # chunk A: j in [0:128), y in [cy - dy - 1, cy + rmax + dy + 2)
        lo_a = max(lo, (int(np.floor(cy - dy_max - 1)) // 8) * 8)
        # chunk B: j in [128:256), y in [cy - rmax - dy - 1, cy + dy + 2)
        hi_b = min(hi, ((int(np.ceil(cy + dy_max + 2)) + 7) // 8) * 8)
        classes.append((start, sz, lo, hi - lo,
                        lo_a - lo, hi - lo_a, 0, hi_b - lo))
        start += sz
    return classes


def _kernel_banded2(img_ref, wxt_ref, *rest,
                    n_dx, n_dy, n_ref, rpb, q_b, classes,
                    do_mirror=True, stage="full", raw4=False,
                    has_mask=False, fold=False):
    """Band-limited fused search with ROLLED ring loops and the tight
    256-lane frequency packing: ``len(classes)`` class sections, each a
    fori_loop over its ring blocks with a uniform 8-aligned y-band,
    rb-major table layouts so every dynamic index is a leading-dim
    slice.

    ccf layout per accumulator row: lanes [0:128] re bins 0..127, lanes
    [128:256] im bins 0..127.  The Nyquist bin of each ring's spectrum
    (real, shared by the mirrored channel) is routed into ``nyq_scr``
    (lanes = rings) via a one-hot lane mask and folded back exactly at
    finalize: C_ny = nyq_scr @ rny (per-(row, k) Nyquist ccf), whose
    irfft contribution is the alternating rank-1 row
    C_ny * (-1)^l / L.

    Static flags: ``do_mirror=False`` (the --nomirror search) drops the
    mirrored channel — no acc_m scratch, half the ccf updates and half
    the rows_scr/finalize work.  ``raw4`` accumulates the four raw
    products (A=sum s_re*r_re, B=sum s_im*r_im, C=sum s_re*r_im,
    D=sum s_im*r_re) in one 512-lane accumulator and combines the
    o/m channels once at finalize — drops the per-ring channel adds
    from the hot loop (mirrored search only).  ``stage`` disables stages for the
    measure-first ablation harness (tools/fused_ablate.py): "no_yred"
    replaces the y-tent contraction with a slice, "no_ccf" skips the
    DFT+ccf block, "sample_only" additionally skips the Nyquist
    finalize; ablated stages emit a max-only dummy result.  Production
    always runs "full"."""
    nc = len(classes)
    wyt_refs = rest[:2 * nc]            # (A, B) chunk tables per class
    tail = rest[2 * nc:]
    if has_mask:
        # --dst discrete-angle search: (8, L) additive angle mask, applied
        # once to the per-lane best values at finalize (adding a per-lane
        # constant commutes with the max over candidates)
        (dft_ref, ref_ref, rny_ref, oh_ref, irf_ref, prio_ref, mask_ref,
         out_ref, polar_scr, nyq_scr) = tail[:10]
        tail = tail[10:]
    else:
        (dft_ref, ref_ref, rny_ref, oh_ref, irf_ref, prio_ref, out_ref,
         polar_scr, nyq_scr) = tail[:9]
        mask_ref = None
        tail = tail[9:]
    if raw4:
        assert do_mirror, "raw4 layout is for the mirrored search"
        acc_r, rows_scr = tail
        acc_o = acc_m = None
    elif do_mirror:
        acc_o, acc_m, rows_scr = tail
        acc_r = None
    else:
        acc_o, rows_scr = tail
        acc_m = acc_r = None
    n_rows = n_dx * n_dy * NT
    n_mirr = 2 if do_mirror else 1
    n_e = n_mirr * n_dx * n_dy * n_ref
    assert not (fold and stage != "full"), \
        "fold finalize has no ablation stages"

    if raw4:
        acc_r[:] = jnp.zeros_like(acc_r)
    else:
        acc_o[:] = jnp.zeros_like(acc_o)
        if do_mirror:
            acc_m[:] = jnp.zeros_like(acc_m)
    nyq_scr[:] = jnp.zeros_like(nyq_scr)

    for cls_idx, (start, sz, y0, bh,
                  a_off, a_wh, b_off, b_wh) in enumerate(classes):
        wyt_a = wyt_refs[2 * cls_idx]
        wyt_b = wyt_refs[2 * cls_idx + 1]
        img_band = img_ref[:, y0:y0 + bh, :].astype(jnp.bfloat16)
        img_flat = img_band.reshape(NT * bh, 128)

        def body(rbl, _, start=start, bh=bh, wyt_a=wyt_a, wyt_b=wyt_b,
                 a_off=a_off, a_wh=a_wh, b_off=b_off, b_wh=b_wh,
                 img_flat=img_flat):
            rb = start + rbl
            for c in range(n_dx):
                wx = wxt_ref[rb, c]                     # (128, q_b)
                u = jnp.dot(img_flat, wx,
                            preferred_element_type=jnp.float32)
                u = u.reshape(NT, bh, q_b)
                for d in range(n_dy):
                    base = (c * n_dy + d) * NT
                    for rr in range(rpb):
                        for (wyt_ch, off, wh, ch) in (
                                (wyt_a, a_off, a_wh, 0),
                                (wyt_b, b_off, b_wh, 1)):
                            lane0 = rr * L + ch * 128
                            if stage == "no_yred":
                                pol = u[:, 0, lane0:lane0 + 128]
                            else:
                                w = wyt_ch[rbl, d, :,
                                           rr * 128:(rr + 1) * 128]
                                pol = jnp.sum(
                                    u[:, off:off + wh, lane0:lane0 + 128]
                                    * w.astype(jnp.float32)[None], axis=1)
                            polar_scr[base:base + NT,
                                      lane0:lane0 + 128] = pol
                del u
            if stage in ("no_ccf", "sample_only"):
                return 0
            if raw4 and n_ref > 1:
                # ring-pair combined RMW: products for all rpb rings of
                # the block summed in vector registers, ONE accumulator
                # read-modify-write per block (halves the dominant VMEM
                # accumulator traffic; the r2 pair experiment lost on the
                # combined layout where channel adds dominated)
                upd = [None] * 4
                for rr in range(rpb):
                    ring = rb * rpb + rr
                    rows = polar_scr[:, rr * L:(rr + 1) * L]
                    spec = jnp.dot(rows.astype(jnp.bfloat16), dft_ref[:],
                                   preferred_element_type=jnp.float32)
                    s_re = spec[:, :128]
                    s_im = spec[:, 128:256]
                    oh = oh_ref[pl.ds(ring, 1)][0][None, :]
                    nyq_scr[:, :] += spec[:, 256:257] * oh
                    r = ref_ref[pl.ds(ring, 1)]
                    r_re = r[0, :, :128].reshape(n_ref, 1, 128)
                    r_im = r[0, :, 128:].reshape(n_ref, 1, 128)
                    ps = (s_re[None] * r_re, s_im[None] * r_im,
                          s_re[None] * r_im, s_im[None] * r_re)
                    for j in range(4):
                        upd[j] = ps[j] if upd[j] is None else upd[j] + ps[j]
                acc_r[:, :, 0:128] += upd[0]
                acc_r[:, :, 128:256] += upd[1]
                acc_r[:, :, 256:384] += upd[2]
                acc_r[:, :, 384:512] += upd[3]
                return 0
            for rr in range(rpb):
                ring = rb * rpb + rr
                rows = polar_scr[:, rr * L:(rr + 1) * L]
                spec = jnp.dot(rows.astype(jnp.bfloat16), dft_ref[:],
                               preferred_element_type=jnp.float32)
                s_re = spec[:, :128]
                s_im = spec[:, 128:256]
                oh = oh_ref[pl.ds(ring, 1)][0][None, :]  # (1, 128)
                nyq_scr[:, :] += spec[:, 256:257] * oh
                r = ref_ref[pl.ds(ring, 1)]              # (1, K, 256)
                if n_ref == 1:
                    # Mosaic rejects the (1,1,128)->(1,rows,128) 3D
                    # broadcast; use plain 2D row broadcasting
                    r_re = r[0, :, :128]                 # (1, 128)
                    r_im = r[0, :, 128:]
                    if raw4:
                        acc_r[0, :, 0:128] += s_re * r_re
                        acc_r[0, :, 128:256] += s_im * r_im
                        acc_r[0, :, 256:384] += s_re * r_im
                        acc_r[0, :, 384:512] += s_im * r_re
                    else:
                        a = s_re * r_re
                        b = s_im * r_im
                        ct = s_re * r_im
                        dt = s_im * r_re
                        acc_o[0, :, :128] += a + b
                        acc_o[0, :, 128:] += ct - dt
                        if do_mirror:
                            acc_m[0, :, :128] += a - b
                            acc_m[0, :, 128:] += -(ct + dt)
                else:
                    # n_ref>1 with raw4 already returned above (the
                    # ring-pair combined-RMW block); only the two-channel
                    # accumulate reaches here
                    assert not raw4
                    r_re = r[0, :, :128].reshape(n_ref, 1, 128)
                    r_im = r[0, :, 128:].reshape(n_ref, 1, 128)
                    a = s_re[None] * r_re
                    b = s_im[None] * r_im
                    ct = s_re[None] * r_im
                    dt = s_im[None] * r_re
                    acc_o[:, :, :128] += a + b
                    acc_o[:, :, 128:] += ct - dt
                    if do_mirror:
                        acc_m[:, :, :128] += a - b
                        acc_m[:, :, 128:] += -(ct + dt)
            return 0

        jax.lax.fori_loop(0, sz, body, 0)

    if raw4:
        channels = None      # o/m packed rows derived from acc_r per k
    else:
        channels = ((0, acc_o), (1, acc_m)) if do_mirror else ((0, acc_o),)

    def packed_rows(m, k):
        """(n_rows, 256) [re|im] accumulator block for channel m, ref k."""
        if not raw4:
            return channels[m][1][k]
        a_ = acc_r[k, :, 0:128]
        b_ = acc_r[k, :, 128:256]
        c_ = acc_r[k, :, 256:384]
        d_ = acc_r[k, :, 384:512]
        if m == 0:
            return jnp.concatenate([a_ + b_, c_ - d_], axis=-1)
        return jnp.concatenate([a_ - b_, -(c_ + d_)], axis=-1)

    if stage != "full":
        # ablation harness: minimal finalize so every variant produces
        # an output with the same shape (values are not meaningful)
        if stage != "sample_only":
            c_ny = jnp.dot(nyq_scr[:], rny_ref[:],
                           preferred_element_type=jnp.float32)
            lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            alt = jnp.where(lane_l % 2 == 0, 1.0 / L, -1.0 / L)
            for m in range(n_mirr):
                for k in range(n_ref):
                    rows = jnp.dot(packed_rows(m, k).astype(jnp.bfloat16),
                                   irf_ref[:],
                                   preferred_element_type=jnp.float32)
                    rows_scr[(m * n_ref + k) * n_rows:
                             (m * n_ref + k + 1) * n_rows, :] = \
                        rows + c_ny[:, k:k + 1] * alt
        allr = rows_scr[:].reshape(n_e, NT, L)
        out_ref[0, :, :128] = jnp.max(allr, axis=0)[:, :128]
        out_ref[0, :, 128:] = jnp.zeros((NT, L), jnp.float32)
        return

    # ---- finalize: Nyquist ccf + inverse DFT + priority argmax
    c_ny = jnp.dot(nyq_scr[:], rny_ref[:],
                   preferred_element_type=jnp.float32)    # (n_rows, 128)
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    alt = jnp.where(lane_l % 2 == 0, 1.0 / L, -1.0 / L)

    if fold:
        # Running-priority fold (r5, VERDICT r4 next #4): instead of
        # materializing every (mirror, ref) slab in a K-scaled rows_scr
        # (0.4 MB per ref per channel — what forces large K into
        # multiple kernel invocations with duplicated sampling passes),
        # each slab is irfft'd into ONE reused (n_rows, L) buffer and
        # folded immediately into per-lane running (value, priority)
        # registers plus the running winner's angle row.  The fold of
        # (max, min-priority-on-tie) is associative, and every slab's
        # rows are computed by the identical matmul — so the result is
        # bit-identical to the materialized finalize.
        s_num = n_dx * n_dy
        big = jnp.float32(1e9)
        neg = jnp.float32(_NEG)
        s3 = jax.lax.broadcasted_iota(jnp.int32, (s_num, NT, L), 0) \
            .astype(jnp.float32)
        gv = jnp.full((NT, 1), neg, jnp.float32)
        ge = jnp.full((NT, 1), big, jnp.float32)
        run_bv = jnp.full((NT, L), neg, jnp.float32)
        run_bm = jnp.full((NT, L), big, jnp.float32)
        run_row = jnp.zeros((NT, L), jnp.float32)
        for m in range(n_mirr):
            for k in range(n_ref):
                rows = jnp.dot(packed_rows(m, k).astype(jnp.bfloat16),
                               irf_ref[:],
                               preferred_element_type=jnp.float32)
                rows_scr[:, :] = rows + c_ny[:, k:k + 1] * alt
                rows3 = rows_scr[:].reshape(s_num, NT, L)
                bv_k = jnp.max(rows3, axis=0)            # (NT, L)
                base = jnp.float32(m * s_num * n_ref + k)
                prio3 = s3 * jnp.float32(n_ref) + base
                bm_k = jnp.min(jnp.where(rows3 == bv_k[None], prio3, big),
                               axis=0)
                if has_mask:
                    # per-lane constant: commutes with every max above;
                    # fold on MASKED values so the captured winner row
                    # belongs to the masked argmax (rows stay unmasked
                    # for the refine-free decode)
                    bv_k = bv_k + mask_ref[0:1, :]
                v_k = jnp.max(bv_k, axis=-1, keepdims=True)      # (NT, 1)
                e_k = jnp.min(jnp.where(bv_k == v_k, bm_k, big),
                              axis=-1, keepdims=True)
                # winning shift row of THIS slab: s* = (e_k - base)/K
                s_star = (e_k - base) / jnp.float32(n_ref)       # (NT, 1)
                sel = (s3[:, :, 0:1] == s_star[None]).astype(jnp.float32)
                row_k = jnp.sum(rows3 * sel, axis=0)             # (NT, L)
                take = (v_k > gv) | ((v_k == gv) & (e_k < ge))
                gv = jnp.where(take, v_k, gv)
                ge = jnp.where(take, e_k, ge)
                run_row = jnp.where(take, row_k, run_row)
                takel = (bv_k > run_bv) | ((bv_k == run_bv)
                                           & (bm_k < run_bm))
                run_bv = jnp.where(takel, bv_k, run_bv)
                run_bm = jnp.where(takel, bm_k, run_bm)
        vmax = jnp.max(run_bv, axis=-1, keepdims=True)
        maskv = run_bv == vmax
        emin = jnp.min(jnp.where(maskv, run_bm, big), axis=-1,
                       keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (NT, L), 1) \
            .astype(jnp.float32)
        amin = jnp.min(jnp.where(maskv & (run_bm == emin), lane, big),
                       axis=-1, keepdims=True)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (NT, 128), 1)
        hdr = (jnp.where(lane128 == 0, vmax, 0.0)
               + jnp.where(lane128 == 1, amin, 0.0)
               + jnp.where(lane128 == 2, emin, 0.0))
        out_ref[0, :, :128] = hdr
        out_ref[0, :, 128:128 + L] = run_row
        return

    for m in range(n_mirr):
        for k in range(n_ref):
            rows = jnp.dot(packed_rows(m, k).astype(jnp.bfloat16), irf_ref[:],
                           preferred_element_type=jnp.float32)
            rows = rows + c_ny[:, k:k + 1] * alt
            rows_scr[(m * n_ref + k) * n_rows:
                     (m * n_ref + k + 1) * n_rows, :] = rows

    big = jnp.float32(1e9)
    allr = rows_scr[:].reshape(n_e, NT, L)
    bv = jnp.max(allr, axis=0)
    prio = prio_ref[:, 0].reshape(n_e, 1, 1)
    bm = jnp.min(jnp.where(allr == bv[None], prio, big), axis=0)
    if has_mask:
        # masked lanes drop out of the lane argmax; the stored winning
        # angle row stays unmasked (decode runs refine=False under a
        # mask, so the row's masked neighbors are never read)
        bv = bv + mask_ref[0:1, :]

    vmax = jnp.max(bv, axis=-1, keepdims=True)
    mask = bv == vmax
    emin = jnp.min(jnp.where(mask, bm, big), axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NT, L), 1).astype(jnp.float32)
    amin = jnp.min(jnp.where(mask & (bm == emin), lane, big),
                   axis=-1, keepdims=True)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (NT, 128), 1)
    hdr = (jnp.where(lane128 == 0, vmax, 0.0)
           + jnp.where(lane128 == 1, amin, 0.0)
           + jnp.where(lane128 == 2, emin, 0.0))
    out_ref[0, :, :128] = hdr

    for n in range(NT):
        e_n = emin[n, 0].astype(jnp.int32)
        m = e_n // (n_dx * n_dy * n_ref)
        rest = e_n % (n_dx * n_dy * n_ref)
        c = rest // (n_dy * n_ref)
        rest2 = rest % (n_dy * n_ref)
        d = rest2 // n_ref
        k = rest2 % n_ref
        loc = (m * n_ref + k) * n_rows + (c * n_dy + d) * NT
        slab = rows_scr[pl.ds(loc, NT), :]
        out_ref[0, n:n + 1, 128:128 + L] = slab[n:n + 1, :]


@lru_cache(maxsize=None)
def _build_banded2(n_dx: int, n_dy: int, n_ref: int, hp: int, rpb: int,
                   n_rings: int, classes: tuple, interpret: bool,
                   do_mirror: bool = True, stage: str = "full",
                   raw4: bool = False, has_mask: bool = False,
                   fold: bool = False):
    q_b = rpb * L
    n_rows = n_dx * n_dy * NT
    n_mirr = 2 if do_mirror else 1
    n_e = n_mirr * n_dx * n_dy * n_ref
    nrb = n_rings // rpb

    kern = partial(_kernel_banded2, n_dx=n_dx, n_dy=n_dy, n_ref=n_ref,
                   rpb=rpb, q_b=q_b, classes=tuple(classes),
                   do_mirror=do_mirror, stage=stage, raw4=raw4,
                   has_mask=has_mask, fold=fold)

    def call(img, wxt_rb, wyts, dft, refp, rny, oh, irf, prio, mask=None):
        t = img.shape[0] // NT
        wyt_specs = []
        for (_, sz, _, _bh, _ao, a_wh, _bo, b_wh) in classes:
            for wh in (a_wh, b_wh):
                wyt_specs.append(
                    pl.BlockSpec((sz, n_dy, wh, rpb * 128),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
        scratch = [
            pltpu.VMEM((n_rows, q_b), jnp.float32),
            pltpu.VMEM((n_rows, 128), jnp.float32),
        ]
        if raw4:
            # one 512-lane raw-product accumulator (same bytes as o+m)
            scratch.append(pltpu.VMEM((n_ref, n_rows, 512), jnp.float32))
        else:
            scratch.append(pltpu.VMEM((n_ref, n_rows, 256), jnp.float32))
            if do_mirror:
                scratch.append(pltpu.VMEM((n_ref, n_rows, 256), jnp.float32))
        # fold: ONE reused slab buffer instead of the K-scaled row store
        scratch.append(pltpu.VMEM(
            ((n_rows, L) if fold else (n_mirr * n_ref * n_rows, L)),
            jnp.float32))
        return pl.pallas_call(
            kern,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((NT, hp, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nrb, n_dx, 128, q_b), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *wyt_specs,
                pl.BlockSpec((L, 384), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, n_ref, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_e, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                *([pl.BlockSpec((8, L), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
                  if has_mask else []),
            ],
            out_specs=pl.BlockSpec((1, NT, 128 + L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, NT, 128 + L), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(img, wxt_rb, *wyts, dft, refp, rny, oh, irf, prio,
          *([mask] if has_mask else []))

    return call


class FusedTables:
    """Padded constant tables for the fused kernels (host numpy).

    ``n_bands``: number of uniform y-band classes for the banded kernel
    (more bands = tighter per-ring-block image bands = less sampling
    work, at the cost of more unrolled class sections)."""

    def __init__(self, cfg: AlignConfig, n_bands: int = 3):
        assert cfg.ring_len == L, "fused kernels are specialized to 256"
        assert cfg.mode == "F", "fused kernels assume full rings (mode F)"
        h = cfg.img_dim
        if h > 128:
            # big-box path: rings only read cx +/- (ring_num + dx + 2)
            # columns, so sample from a 128-wide central slab (window
            # center at lane 64); fused_supported guarantees the fit
            self.x0 = h // 2 - 64
            t = build_polar_tables(cfg, x_window=(self.x0, 128))
        else:
            self.x0 = 0
            t = build_polar_tables(cfg)
        self.hp = _pad_up(h, 8)
        self.rpb = 2 if cfg.ring_num % 2 == 0 else 1
        self.n_rings = cfg.ring_num
        self.n_dx = t.n_dx
        self.n_dy = t.n_dy
        q_b = self.rpb * L
        # band-limited layouts: rb-major wxt, class-banded wyt
        nrb = cfg.ring_num // self.rpb
        self.classes = tuple(_class_plan(cfg, self.hp, self.rpb,
                                         n_classes=n_bands))
        xw = min(h, 128)       # stored image/table width (x window)
        wxt_rb = np.zeros((nrb, t.n_dx, 128, q_b), np.float32)
        for rb in range(nrb):
            sl = slice(rb * q_b, (rb + 1) * q_b)
            wxt_rb[rb, :, :xw, :] = np.swapaxes(t.wx[:, sl, :xw], 1, 2)
        self.wxt_rb = wxt_rb.astype(jnp.bfloat16)
        self.wyts = []
        for (start, sz, y0, bh, a_off, a_wh, b_off, b_wh) in self.classes:
            # per-chunk half-plane tables: chunk A = lanes [0:128) of each
            # ring (sin >= 0, rows >= cy), chunk B = lanes [128:256)
            blk_a = np.zeros((sz, t.n_dy, a_wh, self.rpb * 128), np.float32)
            blk_b = np.zeros((sz, t.n_dy, b_wh, self.rpb * 128), np.float32)
            for rbl in range(sz):
                sl = slice((start + rbl) * q_b, (start + rbl + 1) * q_b)
                sub = t.wy[:, sl, :]        # (n_dy, q_b, H)
                full = np.abs(sub).sum(dtype=np.float64)
                kept = 0.0
                for rr in range(self.rpb):
                    for ch, (blk, off, wh) in enumerate(
                            ((blk_a, a_off, a_wh), (blk_b, b_off, b_wh))):
                        cols = slice(rr * L + ch * 128, rr * L + ch * 128 + 128)
                        rows = slice(y0 + off, y0 + off + wh)
                        piece = sub[:, cols, rows]
                        kept += np.abs(piece).sum(dtype=np.float64)
                        blk[rbl, :, :, rr * 128:(rr + 1) * 128] = \
                            np.swapaxes(piece, 1, 2)
                assert full - kept < 1e-6, (start + rbl, full - kept)
            self.wyts.append(blk_a.astype(jnp.bfloat16))
            self.wyts.append(blk_b.astype(jnp.bfloat16))
        # tight-packing DFT tables
        self.dft_t = np.asarray(_dft_tight())
        self.irf_t = np.asarray(_irfft_tight())
        assert cfg.ring_num <= 128, "Nyquist sidecar uses one lane per ring"
        oh = np.zeros((cfg.ring_num, 128), np.float32)
        oh[np.arange(cfg.ring_num), np.arange(cfg.ring_num)] = 1.0
        self.oh = oh

    def prio_table(self, n_ref: int, mirror: bool = True) -> np.ndarray:
        """Storage-slab -> reference-priority-order map (see the kernel
        finalize): slab index s = (m*K + k)*n_dxy + (c*n_dy + d) maps to
        priority e = ((m*n_dx + c)*n_dy + d)*K + k."""
        n_mirr = 2 if mirror else 1
        n_e = n_mirr * self.n_dx * self.n_dy * n_ref
        prio = np.zeros((n_e, 128), np.float32)
        for m in range(n_mirr):
            for k in range(n_ref):
                for c in range(self.n_dx):
                    for d in range(self.n_dy):
                        s = (m * n_ref + k) * self.n_dx * self.n_dy \
                            + (c * self.n_dy + d)
                        e = ((m * self.n_dx + c) * self.n_dy + d) * n_ref + k
                        prio[s, 0] = e
        return prio


def max_chunk_k(cfg: AlignConfig) -> int:
    """Largest reference count one kernel invocation can hold in VMEM.

    K-scaled scratch per mirror channel: one accumulator (K, n_rows,
    256) f32 plus the angle-row buffer (K * n_rows, 256) f32 — i.e.
    2*K*n_rows*1KB per channel.  ~30 MB of sampling tables +
    image/polar buffers ride on top; keep the total under the ~110 MB
    VMEM budget (v5e).  K=32 at S=49 mirrored (51 MB) compiles and
    runs; larger K runs as ref-axis chunks merged by the exact priority
    order (the reference's per-ref ccf table slots,
    cuda/gpu_aln_noref.cu:1009-1143, have no such ceiling because HBM
    holds the whole table there)."""
    n_rows = len(cfg.shift_x_vals) * len(cfg.shift_y_vals) * NT
    n_mirr = 2 if cfg.mirror else 1
    k = (52 * 1024 * 1024) // (2 * n_mirr * n_rows * 256 * 4)
    # rny/c_ny sidecar tables hold one reference per lane (<=128)
    return min(int(k), 128)


def max_chunk_k_fold(cfg: AlignConfig) -> int:
    """Reference capacity of ONE kernel invocation under the fold
    finalize (r5): only the ccf accumulator scales with K — the angle
    rows are folded slab by slab through one reused buffer instead of
    the K-scaled ``rows_scr`` store, roughly doubling the capacity
    (K=64 at S=49 mirrored runs in one invocation: 51 MB accumulator
    + ~30 MB tables under the ~110 MB budget)."""
    n_rows = len(cfg.shift_x_vals) * len(cfg.shift_y_vals) * NT
    n_mirr = 2 if cfg.mirror else 1
    k = (72 * 1024 * 1024) // (n_mirr * n_rows * 256 * 4)
    return min(int(k), 128)


def fused_supported(cfg: AlignConfig, n_classes: int) -> bool:
    """Geometry gate: the kernels are specialized to ring_len 256, full
    rings, and a 128-lane image width (boxes >128 px fall back to the
    matmul path).  Any K is admitted — references beyond ``max_chunk_k``
    run as VMEM-sized chunks merged in priority order.  (The banded
    kernel clamps its y-band class count to the ring-block count, so
    few-ring configs are fine.)"""
    if cfg.ring_len != L:
        return False
    if cfg.mode != "F":
        # half-ring sampling breaks the half-plane y-window invariant
        # (all lanes then have sin >= 0); H-mode runs the matmul path
        return False
    if cfg.first_ring != 1 or cfg.ring_step != 1:
        # the banded y-class plan assumes ring i at radius i+1; custom
        # --ir/--rs ring schemes run the template/matmul paths (which
        # are radius-agnostic)
        return False
    if cfg.ring_scheme != "cuda":
        return False   # eman2 variable rings run ops/eman_search.py
    if cfg.img_dim > 128:
        # big boxes run through the 128-wide central x-window; the ring
        # extent (radius + shift + bilinear support) must fit beside the
        # window center at lane 64
        if cfg.ring_num + int(np.ceil(np.max(np.abs(
                cfg.shift_x_vals)))) + 2 > 62:
            return False
    return max_chunk_k(cfg) >= 1


def fused_search(images, ref_fw, params: AlignParams, cfg: AlignConfig,
                 tables: FusedTables | None = None,
                 interpret: bool = False,
                 _stage: str = "full", raw4: bool | None = None,
                 _k_chunk: int | None = None,
                 angle_mask=None, fold: bool | None = None) -> SearchResult:
    """Drop-in fused-kernel replacement for ``rotational_shift_search_mm``.

    Args:
      images: (N, H, W) f32 (N padded to a multiple of NT by the caller
        or here).
      ref_fw: (K, R, F) complex64 weighted reference ring spectra
        (``prepare_ref_spectra``).
      _stage: stage-ablation hook for tools/fused_ablate.py only; the
        non-"full" outputs are timing dummies.
      _k_chunk: test/ablation hook forcing the ref-chunk size verbatim
        (no equalization — K=64 with ``_k_chunk=33`` really runs 33+31;
        the default VMEM-derived ``max_chunk_k`` path equalizes).
      angle_mask: optional (L,) additive f32 mask restricting the angle
        argmax (the --dst discrete search, ops/search.delta_angle_mask);
        applied to the per-lane best values at the in-kernel finalize.
        ``best_row`` stays unmasked (decode must use ``refine=False``).

    References beyond ``max_chunk_k(cfg)`` run as multiple kernel
    invocations over ref-axis chunks whose running best is merged in
    the exact table priority order — the large-K path (VERDICT r2 #2;
    reference analog: per-ref ccf slots, cuda/gpu_aln_noref.cu:1009-1143).
    """
    if tables is None:
        tables = FusedTables(cfg)
    n, h, w = images.shape
    k = ref_fw.shape[0]
    if raw4 is None:
        # default: the raw-product accumulator wins on hardware for the
        # mirrored search (174.6 vs 180.2 ms per 8192x(K=8,S=49), r3)
        raw4 = cfg.mirror

    # fast bf16 pre-translate (r5): the kernel's sampling matmuls cast
    # to bf16 anyway, so for integer accumulated shifts this is
    # bit-identical to the old f32-HIGHEST translate — which measured
    # ~3% of the device loop (the gap to the template engine's fused
    # window extraction)
    img_t = translate_bilinear_mm(images, params.shift_x, params.shift_y,
                                  fast=True)
    if tables.x0:
        # big-box central slab (see FusedTables / build_polar_tables)
        img_t = img_t[:, :, tables.x0:tables.x0 + 128]
    n_pad = _pad_up(n, NT)
    img_p = jnp.zeros((n_pad, tables.hp, 128), jnp.float32)
    img_p = img_p.at[:n, :h, :min(w, 128)].set(img_t)

    # fold finalize (r5): large K in ONE kernel invocation — no
    # duplicated sampling pass, no chunk merge.  Opt-in pending a
    # hardware accept/reject measurement (VERDICT r4 next #4); only the
    # full-stage search has a fold variant.
    if fold is None:
        fold = False
    if fold and (_stage != "full" or k > max_chunk_k_fold(cfg)):
        fold = False
    kc = max_chunk_k(cfg) if _k_chunk is None else _k_chunk
    if fold:
        kc = max(kc, max_chunk_k_fold(cfg))
    if kc <= 0:
        raise ValueError("geometry exceeds the fused kernel VMEM budget")
    if k > kc and _k_chunk is None:
        # equalize the chunk sizes (e.g. K=64 at kc=33 -> 32+32, not
        # 33+31): when the equalized kc divides k every chunk shares ONE
        # compiled kernel shape (at most two shapes otherwise), cutting
        # Mosaic compile time; runtime work is identical.  An explicit
        # _k_chunk is honored verbatim so tests/ablations can force
        # uneven splits (ADVICE r4).
        kc = _equalized_chunk(k, kc)
    mask8 = None
    if angle_mask is not None:
        mask8 = jnp.tile(jnp.asarray(angle_mask, jnp.float32)[None, :],
                         (8, 1))
    result = None
    for k0 in range(0, k, kc):
        kk = min(kc, k - k0)
        chunk = _fused_search_one(img_p, ref_fw[k0:k0 + kk], cfg, tables,
                                  interpret, _stage, raw4, n, mask8,
                                  fold=fold)
        result = _merge_chunk(result, chunk, k0, k, tables) \
            if result is not None else chunk
    return result


def _equalized_chunk(k: int, kc: int) -> int:
    """Smallest per-chunk size covering ``k`` in ``ceil(k/kc)`` chunks —
    K=64 at kc=33 gives 32 (two equal chunks), K=8 at kc=5 gives 4,
    K=65 at kc=33 stays 33 (33+32; equal sizes are impossible there)."""
    return -(-k // -(-k // kc))


def _merge_chunk(a: SearchResult, b: SearchResult, k_off: int, k_total: int,
                 tables: FusedTables) -> SearchResult:
    """Fold ref-chunk result ``b`` (refs [k_off, ...)) into running best
    ``a`` by the exact table priority (mirror, shift, ref, angle) —
    value first, smaller priority index on exact ties (the in-kernel
    argmax applies the same rule within a chunk)."""
    s = tables.n_dx * tables.n_dy
    b = b._replace(best_ref=b.best_ref + k_off)
    e_a = (a.best_mirror * s + a.best_sidx) * k_total + a.best_ref
    e_b = (b.best_mirror * s + b.best_sidx) * k_total + b.best_ref
    better = (b.best_val > a.best_val) | ((b.best_val == a.best_val)
                                          & (e_b < e_a))
    sel = lambda x, y: jnp.where(better, x, y)
    return SearchResult(
        best_val=sel(b.best_val, a.best_val),
        best_row=jnp.where(better[:, None], b.best_row, a.best_row),
        best_aidx=sel(b.best_aidx, a.best_aidx),
        best_sidx=sel(b.best_sidx, a.best_sidx),
        best_ref=sel(b.best_ref, a.best_ref),
        best_mirror=sel(b.best_mirror, a.best_mirror),
    )


def _fused_search_one(img_p, ref_fw, cfg, tables, interpret, stage, raw4,
                      n: int, mask8=None, fold: bool = False) -> SearchResult:
    """One kernel invocation over a (VMEM-sized) slice of the refs."""
    k = ref_fw.shape[0]
    n_pad = img_p.shape[0]
    re = jnp.real(ref_fw)   # (K, R, F)
    im = jnp.imag(ref_fw)

    # tight packing: (R, K, 256) = [re bins 0..127 | im bins 0..127],
    # Nyquist (re bin 128, real) in its own (ring, k) table
    refp = jnp.zeros((cfg.ring_num, k, 256), jnp.float32)
    refp = refp.at[:, :, :128].set(jnp.swapaxes(re[:, :, :128], 0, 1))
    refp = refp.at[:, :, 128:].set(jnp.swapaxes(im[:, :, :128], 0, 1))
    rny = jnp.zeros((128, 128), jnp.float32)
    rny = rny.at[:cfg.ring_num, :k].set(jnp.swapaxes(re[:, :, 128], 0, 1))
    call = _build_banded2(tables.n_dx, tables.n_dy, k, tables.hp,
                          tables.rpb, tables.n_rings, tables.classes,
                          interpret, do_mirror=cfg.mirror, stage=stage,
                          raw4=raw4 and cfg.mirror,
                          has_mask=mask8 is not None, fold=fold)
    out = call(img_p, jnp.asarray(tables.wxt_rb),
               tuple(jnp.asarray(w) for w in tables.wyts),
               jnp.asarray(tables.dft_t), refp, rny,
               jnp.asarray(tables.oh), jnp.asarray(tables.irf_t),
               jnp.asarray(tables.prio_table(k, mirror=cfg.mirror)),
               mask=mask8)
    out = out.reshape(n_pad, 128 + L)

    val = out[:n, 0]
    aidx = out[:n, 1].astype(jnp.int32)
    e = out[:n, 2].astype(jnp.int32)
    row = out[:n, 128:128 + L]
    n_dy = tables.n_dy
    n_dxy = tables.n_dx * n_dy
    mirror = e // (n_dxy * k)
    rest = e % (n_dxy * k)
    c = rest // (n_dy * k)
    rest2 = rest % (n_dy * k)
    d = rest2 // k
    ref = rest2 % k
    # global shift index, x-major (config.shifts order)
    sidx = c * n_dy + d
    # normalize: the XLA paths use a normalized irfft; the packed irfft
    # matrix already is, so values match ccf_rows directly.
    return SearchResult(best_val=val, best_row=row, best_aidx=aidx,
                        best_sidx=sidx, best_ref=ref, best_mirror=mirror)
