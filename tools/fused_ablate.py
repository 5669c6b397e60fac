"""Ablation benchmark for the banded fused kernel: time kernel variants
with individual stages disabled to locate the bottleneck (run on TPU).

Not a test — a measurement harness for the roofline work (VERDICT r1
next #2). Usage: timeout 560 python tools/fused_ablate.py
"""

import os
import sys
import time
from functools import lru_cache, partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

from cryo_ralib_tpu.config import AlignConfig

fs = importlib.import_module("cryo_ralib_tpu.ops.fused_search")
from cryo_ralib_tpu.ops.polar_mm import translate_bilinear_mm
from cryo_ralib_tpu.ops.search import prepare_ref_spectra
from cryo_ralib_tpu.params import AlignParams

NT, L, F, FP = fs.NT, fs.L, fs.F, fs.FP

NX, K, N = 90, 8, 8192
cfg = AlignConfig(img_dim=NX, ring_num=36, ring_len=256, shift_step=1.0,
                  shift_rng_x=3.0, shift_rng_y=3.0)


def make_kernel(mode):
    """mode: 'full', 'no_ccf' (skip ref multiply+acc), 'no_yred' (replace
    y-reduction with a slice), 'no_dft' (skip DFT+ccf), 'sample_only'."""

    def kern(img_ref, wxt_ref, wyt0_ref, wyt1_ref, wyt2_ref, dft_ref,
             ref_ref, irf_ref, prio_ref, out_ref,
             polar_scr, acc_o, acc_m, rows_scr,
             *, n_dx, n_dy, n_ref, rpb, q_b, classes):
        n_rows = n_dx * n_dy * NT
        acc_o[:] = jnp.zeros_like(acc_o)
        acc_m[:] = jnp.zeros_like(acc_m)
        wyt_refs = (wyt0_ref, wyt1_ref, wyt2_ref)
        for cls_idx, (start, sz, y0, bh) in enumerate(classes):
            wyt_c = wyt_refs[cls_idx]
            img_band = img_ref[:, y0:y0 + bh, :].astype(jnp.bfloat16)
            img_band = img_band.reshape(NT * bh, 128)

            def body(rbl, _, start=start, bh=bh, wyt_c=wyt_c,
                     img_band=img_band):
                rb = start + rbl
                for c in range(n_dx):
                    wx = wxt_ref[rb, c]
                    u = jnp.dot(img_band, wx,
                                preferred_element_type=jnp.float32)
                    u = u.reshape(NT, bh, q_b).astype(jnp.bfloat16)
                    for d in range(n_dy):
                        if mode == 'no_yred':
                            pol = u[:, 0, :].astype(jnp.float32)
                        else:
                            w = wyt_c[rbl, d]
                            pol = jnp.sum((u * w[None]).astype(jnp.float32),
                                          axis=1)
                        polar_scr[(c * n_dy + d) * NT:
                                  (c * n_dy + d + 1) * NT, :] = pol
                if mode in ('no_dft', 'sample_only'):
                    return 0
                for rr in range(rpb):
                    rows = polar_scr[:, rr * L:(rr + 1) * L]
                    spec = jnp.dot(rows.astype(jnp.bfloat16), dft_ref[:],
                                   preferred_element_type=jnp.float32)
                    if mode == 'no_ccf':
                        acc_o[0] += spec
                        continue
                    s_re = spec[:, :FP]
                    s_im = spec[:, FP:]
                    for k in range(n_ref):
                        r_re = ref_ref[rb * rpb + rr, k, :FP][None]
                        r_im = ref_ref[rb * rpb + rr, k, FP:][None]
                        a = s_re * r_re
                        b = s_im * r_im
                        ct = s_re * r_im
                        dt = s_im * r_re
                        acc_o[k] += jnp.concatenate([a + b, ct - dt], -1)
                        acc_m[k] += jnp.concatenate([a - b, -(ct + dt)], -1)
                return 0

            jax.lax.fori_loop(0, sz, body, 0)

        # finalize (always, except sample_only skips irfft too)
        n_e = 2 * n_dx * n_dy * n_ref
        if mode != 'sample_only':
            for m, acc in ((0, acc_o), (1, acc_m)):
                for k in range(n_ref):
                    rows = jnp.dot(acc[k].astype(jnp.bfloat16), irf_ref[:],
                                   preferred_element_type=jnp.float32)
                    rows_scr[(m * n_ref + k) * n_rows:
                             (m * n_ref + k + 1) * n_rows, :] = rows
        big = jnp.float32(1e9)
        allr = rows_scr[:].reshape(n_e, NT, L)
        bv = jnp.max(allr, axis=0)
        prio = prio_ref[:, 0].reshape(n_e, 1, 1)
        bm = jnp.min(jnp.where(allr == bv[None], prio, big), axis=0)
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
            kk = rest2 % n_ref
            d = rest2 // n_ref
            loc = (m * n_ref + kk) * n_rows + (c * n_dy + d) * NT
            slab = rows_scr[pl.ds(loc, NT), :]
            out_ref[0, n:n + 1, 128:128 + L] = slab[n:n + 1, :]

    return kern


def build(mode, tables, k):
    n_dx, n_dy, rpb = tables.n_dx, tables.n_dy, tables.rpb
    hp, n_rings = tables.hp, tables.n_rings
    classes = tables.classes
    q_b = rpb * L
    n_rows = n_dx * n_dy * NT
    n_e = 2 * n_dx * n_dy * k
    nrb = n_rings // rpb
    kern = partial(make_kernel(mode), n_dx=n_dx, n_dy=n_dy, n_ref=k,
                   rpb=rpb, q_b=q_b, classes=tuple(classes))

    def call(img, wxt_rb, wyts, dft, refp, irf, prio):
        t = img.shape[0] // NT
        wyt_specs = [
            pl.BlockSpec((sz, n_dy, bh, q_b), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for (_, sz, _, bh) in classes]
        return pl.pallas_call(
            kern, grid=(t,),
            in_specs=[
                pl.BlockSpec((NT, hp, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nrb, n_dx, 128, q_b), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *wyt_specs,
                pl.BlockSpec((L, 2 * FP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, k, 2 * FP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * FP, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_e, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NT, 128 + L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, NT, 128 + L), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_rows, q_b), jnp.float32),
                pltpu.VMEM((k, n_rows, 2 * FP), jnp.float32),
                pltpu.VMEM((k, n_rows, 2 * FP), jnp.float32),
                pltpu.VMEM((2 * k * n_rows, L), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(img, wxt_rb, *wyts, dft, refp, irf, prio)

    return call


def make_kernel_v2(variant, nt=NT):
    """Prototype optimizations:
    - row-major polar scratch (2*n_rows, 256): ONE DFT dot per ring block
    - ccf: broadcast over K in one 3D op per ring, acc RMW once per ring
    - y-reduction variants: 'dense' (as today, f32), 'slab' (stream 8-row
      slabs into a VMEM accumulator)
    """

    def kern(img_ref, wxt_ref, wyt0_ref, wyt1_ref, wyt2_ref, dft_ref,
             ref_ref, irf_ref, prio_ref, out_ref,
             polar_scr, acc_o, acc_m, rows_scr,
             *, n_dx, n_dy, n_ref, rpb, q_b, classes):
        n_rows = n_dx * n_dy * nt
        acc_o[:] = jnp.zeros_like(acc_o)
        acc_m[:] = jnp.zeros_like(acc_m)
        wyt_refs = (wyt0_ref, wyt1_ref, wyt2_ref)
        for cls_idx, (start, sz, y0, bh) in enumerate(classes):
            wyt_c = wyt_refs[cls_idx]
            img_band = img_ref[:, y0:y0 + bh, :].astype(jnp.bfloat16)
            img_flat = img_band.reshape(nt * bh, 128)

            def body(rbl, _, start=start, bh=bh, wyt_c=wyt_c,
                     img_band=img_band, img_flat=img_flat):
                rb = start + rbl
                for c in range(n_dx):
                    if variant == "slab":
                        # stream 8-row y-slabs; per-slab x-matmul stays in
                        # registers; accumulate pol per d in VMEM
                        for d in range(n_dy):
                            polar_scr[pl.ds((c * n_dy + d) * nt, nt), :] = (
                                jnp.zeros((nt, q_b), jnp.float32))
                        for ys in range(0, bh, 8):
                            sl = img_band[:, ys:ys + 8, :].reshape(nt * 8, 128)
                            u_s = jnp.dot(sl, wxt_ref[rb, c],
                                          preferred_element_type=jnp.float32)
                            u_s = u_s.reshape(nt, 8, q_b)
                            for d in range(n_dy):
                                w = wyt_c[rbl, d, ys:ys + 8, :]
                                part = jnp.sum(u_s * w[None], axis=1)
                                idx = (c * n_dy + d) * nt
                                polar_scr[pl.ds(idx, nt), :] += part
                    else:
                        u = jnp.dot(img_flat, wxt_ref[rb, c],
                                    preferred_element_type=jnp.float32)
                        if "ybf16" in variant:
                            u = u.reshape(nt, bh, q_b).astype(jnp.bfloat16)
                        else:
                            u = u.reshape(nt, bh, q_b)
                        for d in range(n_dy):
                            if "noyred" in variant:
                                pol = u[:, 0, :].astype(jnp.float32)
                            elif "ythird" in variant:
                                b3 = max(8, ((bh // 3) // 8) * 8)
                                w = wyt_c[rbl, d, :b3, :].astype(jnp.float32)
                                pol = jnp.sum(u[:, :b3, :] * w[None], axis=1)
                            elif "rtree" in variant:
                                w = wyt_c[rbl, d].astype(jnp.float32)
                                pol = None
                                for ys in range(0, bh, 8):
                                    part = jnp.sum(
                                        u[:, ys:ys + 8, :]
                                        * w[ys:ys + 8][None], axis=1)
                                    pol = part if pol is None else pol + part
                            else:
                                w = wyt_c[rbl, d]
                                if "ybf16" not in variant:
                                    w = w.astype(jnp.float32)
                                pol = jnp.sum(
                                    (u * w[None]).astype(jnp.float32),
                                    axis=1)
                            polar_scr[(c * n_dy + d) * nt:
                                      (c * n_dy + d + 1) * nt, :] = pol
                # polar_scr (n_rows, q_b) lanes [rr*L:(rr+1)*L] per ring;
                # one DFT per ring still, but ccf broadcast over K
                if "noccf" in variant:
                    return 0
                if "comb" in variant:
                    o_re = o_im = m_re = m_im = None
                for rr in range(rpb):
                    rows = polar_scr[:, rr * L:(rr + 1) * L]
                    spec = jnp.dot(rows.astype(jnp.bfloat16), dft_ref[:],
                                   preferred_element_type=jnp.float32)
                    s_re = spec[:, :FP]
                    s_im = spec[:, FP:]
                    r = ref_ref[pl.ds(rb * rpb + rr, 1)]  # (1, K, 512)
                    r_re = r[0, :, :FP].reshape(n_ref, 1, FP)
                    r_im = r[0, :, FP:].reshape(n_ref, 1, FP)
                    a = s_re[None] * r_re
                    b = s_im[None] * r_im
                    ct = s_re[None] * r_im
                    dt = s_im[None] * r_re
                    if "comb" in variant:
                        if o_re is None:
                            o_re, o_im = a + b, ct - dt
                            m_re, m_im = a - b, -(ct + dt)
                        else:
                            o_re += a + b
                            o_im += ct - dt
                            m_re += a - b
                            m_im += -(ct + dt)
                    else:
                        acc_o[:, :, :FP] += a + b
                        acc_o[:, :, FP:] += ct - dt
                        acc_m[:, :, :FP] += a - b
                        acc_m[:, :, FP:] += -(ct + dt)
                if "comb" in variant:
                    acc_o[:, :, :FP] += o_re
                    acc_o[:, :, FP:] += o_im
                    acc_m[:, :, :FP] += m_re
                    acc_m[:, :, FP:] += m_im
                return 0

            jax.lax.fori_loop(0, sz, body, 0)

        n_e = 2 * n_dx * n_dy * n_ref
        for m, acc in ((0, acc_o), (1, acc_m)):
            for k in range(n_ref):
                rows = jnp.dot(acc[k].astype(jnp.bfloat16), irf_ref[:],
                               preferred_element_type=jnp.float32)
                rows_scr[(m * n_ref + k) * n_rows:
                         (m * n_ref + k + 1) * n_rows, :] = rows
        big = jnp.float32(1e9)
        allr = rows_scr[:].reshape(n_e, nt, L)
        bv = jnp.max(allr, axis=0)
        prio = prio_ref[:, 0].reshape(n_e, 1, 1)
        bm = jnp.min(jnp.where(allr == bv[None], prio, big), axis=0)
        vmax = jnp.max(bv, axis=-1, keepdims=True)
        mask = bv == vmax
        emin = jnp.min(jnp.where(mask, bm, big), axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nt, L), 1).astype(jnp.float32)
        amin = jnp.min(jnp.where(mask & (bm == emin), lane, big),
                       axis=-1, keepdims=True)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (nt, 128), 1)
        hdr = (jnp.where(lane128 == 0, vmax, 0.0)
               + jnp.where(lane128 == 1, amin, 0.0)
               + jnp.where(lane128 == 2, emin, 0.0))
        out_ref[0, :, :128] = hdr
        for n in range(nt):
            e_n = emin[n, 0].astype(jnp.int32)
            m = e_n // (n_dx * n_dy * n_ref)
            rest = e_n % (n_dx * n_dy * n_ref)
            c = rest // (n_dy * n_ref)
            rest2 = rest % (n_dy * n_ref)
            kk = rest2 % n_ref
            d = rest2 // n_ref
            loc = (m * n_ref + kk) * n_rows + (c * n_dy + d) * nt
            slab = rows_scr[pl.ds(loc, nt), :]
            out_ref[0, n:n + 1, 128:128 + L] = slab[n:n + 1, :]

    return kern


def make_kernel_v3(variant):
    """v2:dense + row-major polar scratch (rpb*n_rows, 256) with a single
    DFT matmul per ring block + per-block register-combined ccf (one
    accumulator RMW per block instead of per ring).
    variant: 'f32' (f32 y product) or 'bf16' (original u bf16 round-trip,
    bit-compatible with the current kernel)."""

    def kern(img_ref, wxt_ref, wyt0_ref, wyt1_ref, wyt2_ref, dft_ref,
             ref_ref, irf_ref, prio_ref, out_ref,
             polar_scr, acc_o, acc_m, rows_scr,
             *, n_dx, n_dy, n_ref, rpb, q_b, classes):
        n_rows = n_dx * n_dy * NT
        acc_o[:] = jnp.zeros_like(acc_o)
        acc_m[:] = jnp.zeros_like(acc_m)
        wyt_refs = (wyt0_ref, wyt1_ref, wyt2_ref)
        for cls_idx, (start, sz, y0, bh) in enumerate(classes):
            wyt_c = wyt_refs[cls_idx]
            img_band = img_ref[:, y0:y0 + bh, :].astype(jnp.bfloat16)
            img_flat = img_band.reshape(NT * bh, 128)

            def body(rbl, _, start=start, bh=bh, wyt_c=wyt_c,
                     img_flat=img_flat):
                rb = start + rbl
                for c in range(n_dx):
                    u = jnp.dot(img_flat, wxt_ref[rb, c],
                                preferred_element_type=jnp.float32)
                    if variant == "bf16":
                        u = u.reshape(NT, bh, q_b).astype(jnp.bfloat16)
                    else:
                        u = u.reshape(NT, bh, q_b)
                    for d in range(n_dy):
                        w = wyt_c[rbl, d]
                        if variant != "bf16":
                            w = w.astype(jnp.float32)
                        pol = jnp.sum((u * w[None]).astype(jnp.float32),
                                      axis=1)
                        # row-major: ring rr rows at rr*n_rows + row
                        base = (c * n_dy + d) * NT
                        polar_scr[pl.ds(base, NT), :] = pol[:, :L]
                        if rpb == 2:
                            polar_scr[pl.ds(n_rows + base, NT), :] = \
                                pol[:, L:]
                    del u
                # ONE DFT for all rings of the block
                spec = jnp.dot(polar_scr[:].astype(jnp.bfloat16), dft_ref[:],
                               preferred_element_type=jnp.float32)
                r = ref_ref[pl.ds(rb * rpb, rpb)]        # (rpb, K, 512)
                o_re = o_im = m_re = m_im = None
                for rr in range(rpb):
                    s_re = spec[rr * n_rows:(rr + 1) * n_rows, :FP]
                    s_im = spec[rr * n_rows:(rr + 1) * n_rows, FP:]
                    r_re = r[rr, :, :FP].reshape(n_ref, 1, FP)
                    r_im = r[rr, :, FP:].reshape(n_ref, 1, FP)
                    a = s_re[None] * r_re
                    b = s_im[None] * r_im
                    ct = s_re[None] * r_im
                    dt = s_im[None] * r_re
                    if o_re is None:
                        o_re, o_im = a + b, ct - dt
                        m_re, m_im = a - b, -(ct + dt)
                    else:
                        o_re += a + b
                        o_im += ct - dt
                        m_re += a - b
                        m_im += -(ct + dt)
                acc_o[:, :, :FP] += o_re
                acc_o[:, :, FP:] += o_im
                acc_m[:, :, :FP] += m_re
                acc_m[:, :, FP:] += m_im
                return 0

            jax.lax.fori_loop(0, sz, body, 0)

        n_e = 2 * n_dx * n_dy * n_ref
        for m, acc in ((0, acc_o), (1, acc_m)):
            for k in range(n_ref):
                rows = jnp.dot(acc[k].astype(jnp.bfloat16), irf_ref[:],
                               preferred_element_type=jnp.float32)
                rows_scr[(m * n_ref + k) * n_rows:
                         (m * n_ref + k + 1) * n_rows, :] = rows
        big = jnp.float32(1e9)
        allr = rows_scr[:].reshape(n_e, NT, L)
        bv = jnp.max(allr, axis=0)
        prio = prio_ref[:, 0].reshape(n_e, 1, 1)
        bm = jnp.min(jnp.where(allr == bv[None], prio, big), axis=0)
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
            kk = rest2 % n_ref
            d = rest2 // n_ref
            loc = (m * n_ref + kk) * n_rows + (c * n_dy + d) * NT
            slab = rows_scr[pl.ds(loc, NT), :]
            out_ref[0, n:n + 1, 128:128 + L] = slab[n:n + 1, :]

    return kern


def build_v3(variant, tables, k):
    n_dx, n_dy, rpb = tables.n_dx, tables.n_dy, tables.rpb
    hp, n_rings = tables.hp, tables.n_rings
    classes = tables.classes
    q_b = rpb * L
    n_rows = n_dx * n_dy * NT
    n_e = 2 * n_dx * n_dy * k
    nrb = n_rings // rpb
    kern = partial(make_kernel_v3(variant), n_dx=n_dx, n_dy=n_dy, n_ref=k,
                   rpb=rpb, q_b=q_b, classes=tuple(classes))

    def call(img, wxt_rb, wyts, dft, refp, irf, prio):
        t = img.shape[0] // NT
        wyt_specs = [
            pl.BlockSpec((sz, n_dy, bh, q_b), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for (_, sz, _, bh) in classes]
        return pl.pallas_call(
            kern, grid=(t,),
            in_specs=[
                pl.BlockSpec((NT, hp, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nrb, n_dx, 128, q_b), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *wyt_specs,
                pl.BlockSpec((L, 2 * FP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, k, 2 * FP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * FP, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_e, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NT, 128 + L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, NT, 128 + L), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rpb * n_rows, L), jnp.float32),
                pltpu.VMEM((k, n_rows, 2 * FP), jnp.float32),
                pltpu.VMEM((k, n_rows, 2 * FP), jnp.float32),
                pltpu.VMEM((2 * k * n_rows, L), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(img, wxt_rb, *wyts, dft, refp, irf, prio)

    return call


def make_kernel_v5(nt=NT):
    """v2:dense + tight 256-lane frequency packing: re bins 0..127 in
    lanes [0:128], im bins 0..127 in lanes [128:256]; the Nyquist bin
    (128) is routed through a per-ring sidecar (nyq_scr lanes = rings)
    and added back exactly at finalize as a rank-1 update, using
    C_ny = conj(S)_ny R_ny = S_ny R_ny (real at Nyquist, identical for
    the mirrored channel).  Halves ccf VPU work + accumulator traffic."""

    def kern(img_ref, wxt_ref, wyt0_ref, wyt1_ref, wyt2_ref, dft_ref,
             ref_ref, rny_ref, oh_ref, irf_ref, prio_ref, out_ref,
             polar_scr, nyq_scr, acc_o, acc_m, rows_scr,
             *, n_dx, n_dy, n_ref, rpb, q_b, classes):
        n_rows = n_dx * n_dy * nt
        acc_o[:] = jnp.zeros_like(acc_o)
        acc_m[:] = jnp.zeros_like(acc_m)
        nyq_scr[:] = jnp.zeros_like(nyq_scr)
        wyt_refs = (wyt0_ref, wyt1_ref, wyt2_ref)
        for cls_idx, (start, sz, y0, bh) in enumerate(classes):
            wyt_c = wyt_refs[cls_idx]
            img_band = img_ref[:, y0:y0 + bh, :].astype(jnp.bfloat16)
            img_flat = img_band.reshape(nt * bh, 128)

            def body(rbl, _, start=start, bh=bh, wyt_c=wyt_c,
                     img_flat=img_flat):
                rb = start + rbl
                for c in range(n_dx):
                    u = jnp.dot(img_flat, wxt_ref[rb, c],
                                preferred_element_type=jnp.float32)
                    u = u.reshape(nt, bh, q_b)
                    for d in range(n_dy):
                        w = wyt_c[rbl, d].astype(jnp.float32)
                        pol = jnp.sum(u * w[None], axis=1)
                        polar_scr[(c * n_dy + d) * nt:
                                  (c * n_dy + d + 1) * nt, :] = pol
                    del u
                for rr in range(rpb):
                    ring = rb * rpb + rr
                    rows = polar_scr[:, rr * L:(rr + 1) * L]
                    spec = jnp.dot(rows.astype(jnp.bfloat16), dft_ref[:],
                                   preferred_element_type=jnp.float32)
                    s_re = spec[:, :128]
                    s_im = spec[:, 128:256]
                    # Nyquist sidecar: lane `ring` of nyq_scr
                    oh = oh_ref[pl.ds(ring, 1)][0][None, :]   # (1, 128)
                    nyq_scr[:, :] += spec[:, 256:257] * oh
                    r = ref_ref[pl.ds(ring, 1)]               # (1, K, 256)
                    r_re = r[0, :, :128].reshape(n_ref, 1, 128)
                    r_im = r[0, :, 128:].reshape(n_ref, 1, 128)
                    a = s_re[None] * r_re
                    b = s_im[None] * r_im
                    ct = s_re[None] * r_im
                    dt = s_im[None] * r_re
                    acc_o[:, :, :128] += a + b
                    acc_o[:, :, 128:] += ct - dt
                    acc_m[:, :, :128] += a - b
                    acc_m[:, :, 128:] += -(ct + dt)
                return 0

            jax.lax.fori_loop(0, sz, body, 0)

        n_e = 2 * n_dx * n_dy * n_ref
        # Nyquist ccf for every (row, k): one small matmul
        c_ny = jnp.dot(nyq_scr[:], rny_ref[:],
                       preferred_element_type=jnp.float32)  # (n_rows, 128)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        alt = jnp.where(lane_l % 2 == 0, 1.0 / L, -1.0 / L)
        for m, acc in ((0, acc_o), (1, acc_m)):
            for k in range(n_ref):
                rows = jnp.dot(acc[k].astype(jnp.bfloat16), irf_ref[:],
                               preferred_element_type=jnp.float32)
                rows = rows + c_ny[:, k:k + 1] * alt
                rows_scr[(m * n_ref + k) * n_rows:
                         (m * n_ref + k + 1) * n_rows, :] = rows
        big = jnp.float32(1e9)
        allr = rows_scr[:].reshape(n_e, nt, L)
        bv = jnp.max(allr, axis=0)
        prio = prio_ref[:, 0].reshape(n_e, 1, 1)
        bm = jnp.min(jnp.where(allr == bv[None], prio, big), axis=0)
        vmax = jnp.max(bv, axis=-1, keepdims=True)
        mask = bv == vmax
        emin = jnp.min(jnp.where(mask, bm, big), axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nt, L), 1).astype(jnp.float32)
        amin = jnp.min(jnp.where(mask & (bm == emin), lane, big),
                       axis=-1, keepdims=True)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (nt, 128), 1)
        hdr = (jnp.where(lane128 == 0, vmax, 0.0)
               + jnp.where(lane128 == 1, amin, 0.0)
               + jnp.where(lane128 == 2, emin, 0.0))
        out_ref[0, :, :128] = hdr
        for n in range(nt):
            e_n = emin[n, 0].astype(jnp.int32)
            m = e_n // (n_dx * n_dy * n_ref)
            rest = e_n % (n_dx * n_dy * n_ref)
            c = rest // (n_dy * n_ref)
            rest2 = rest % (n_dy * n_ref)
            kk = rest2 % n_ref
            d = rest2 // n_ref
            loc = (m * n_ref + kk) * n_rows + (c * n_dy + d) * nt
            slab = rows_scr[pl.ds(loc, nt), :]
            out_ref[0, n:n + 1, 128:128 + L] = slab[n:n + 1, :]

    return kern


@lru_cache(maxsize=None)
def _dft_tight():
    """(256, 384): [0:128] cos 0..127, [128:256] sin 0..127,
    [256] cos 128 (Nyquist), rest zero."""
    c, s = fs._rfft_mats(L) if hasattr(fs, "_rfft_mats") else (None, None)
    from cryo_ralib_tpu.ops.dft import _rfft_mats
    c, s = _rfft_mats(L)
    out = np.zeros((L, 384), np.float32)
    out[:, :128] = c[:, :128]
    out[:, 128:256] = s[:, :128]
    out[:, 256] = c[:, 128]
    return out.astype(jnp.bfloat16)


@lru_cache(maxsize=None)
def _irfft_tight():
    """(256, 256): rows [0:128] = Cr bins 0..127, [128:256] = Ci 0..127."""
    from cryo_ralib_tpu.ops.dft import _irfft_mats
    cr, ci = _irfft_mats(L)
    out = np.zeros((256, L), np.float32)
    out[:128] = cr[:128]
    out[128:] = ci[:128]
    return out.astype(jnp.bfloat16)


def build_v5(tables, k, n_rings, nt=NT):
    n_dx, n_dy, rpb = tables.n_dx, tables.n_dy, tables.rpb
    hp = tables.hp
    classes = tables.classes
    q_b = rpb * L
    n_rows = n_dx * n_dy * nt
    n_e = 2 * n_dx * n_dy * k
    nrb = n_rings // rpb
    kern = partial(make_kernel_v5(nt=nt), n_dx=n_dx, n_dy=n_dy, n_ref=k,
                   rpb=rpb, q_b=q_b, classes=tuple(classes))

    def call(img, wxt_rb, wyts, dft, refp, rny, oh, irf, prio):
        t = img.shape[0] // nt
        wyt_specs = [
            pl.BlockSpec((sz, n_dy, bh, q_b), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for (_, sz, _, bh) in classes]
        return pl.pallas_call(
            kern, grid=(t,),
            in_specs=[
                pl.BlockSpec((nt, hp, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nrb, n_dx, 128, q_b), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *wyt_specs,
                pl.BlockSpec((L, 384), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, k, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_e, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nt, 128 + L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, nt, 128 + L), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_rows, q_b), jnp.float32),
                pltpu.VMEM((n_rows, 128), jnp.float32),
                pltpu.VMEM((k, n_rows, 256), jnp.float32),
                pltpu.VMEM((k, n_rows, 256), jnp.float32),
                pltpu.VMEM((2 * k * n_rows, L), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(img, wxt_rb, *wyts, dft, refp, rny, oh, irf, prio)

    return call


def v5_inputs(tables, refp512, k, n_rings):
    """Repack the 512-lane ref spectra into 256-lane + Nyquist tables."""
    refp = np.asarray(refp512)
    refp256 = np.zeros((n_rings, k, 256), np.float32)
    refp256[:, :, :128] = refp[:, :, :128]
    refp256[:, :, 128:] = refp[:, :, FP:FP + 128]
    rny = np.zeros((128, 128), np.float32)
    rny[:n_rings, :k] = refp[:, :, 128]          # Nyquist re per (ring, k)
    oh = np.zeros((n_rings, 128), np.float32)
    oh[np.arange(n_rings), np.arange(n_rings)] = 1.0
    return (jnp.asarray(refp256), jnp.asarray(rny), jnp.asarray(oh),
            jnp.asarray(np.asarray(_dft_tight())),
            jnp.asarray(np.asarray(_irfft_tight())))


def build_v2(variant, tables, k, nt=NT):
    n_dx, n_dy, rpb = tables.n_dx, tables.n_dy, tables.rpb
    hp, n_rings = tables.hp, tables.n_rings
    classes = tables.classes
    q_b = rpb * L
    n_rows = n_dx * n_dy * nt
    n_e = 2 * n_dx * n_dy * k
    nrb = n_rings // rpb
    kern = partial(make_kernel_v2(variant, nt=nt), n_dx=n_dx, n_dy=n_dy,
                   n_ref=k, rpb=rpb, q_b=q_b, classes=tuple(classes))

    def call(img, wxt_rb, wyts, dft, refp, irf, prio):
        t = img.shape[0] // nt
        wyt_specs = [
            pl.BlockSpec((sz, n_dy, bh, q_b), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for (_, sz, _, bh) in classes]
        return pl.pallas_call(
            kern, grid=(t,),
            in_specs=[
                pl.BlockSpec((nt, hp, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nrb, n_dx, 128, q_b), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *wyt_specs,
                pl.BlockSpec((L, 2 * FP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rings, k, 2 * FP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * FP, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_e, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nt, 128 + L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, nt, 128 + L), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_rows, q_b), jnp.float32),
                pltpu.VMEM((k, n_rows, 2 * FP), jnp.float32),
                pltpu.VMEM((k, n_rows, 2 * FP), jnp.float32),
                pltpu.VMEM((2 * k * n_rows, L), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(img, wxt_rb, *wyts, dft, refp, irf, prio)

    return call


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((N, NX, NX)).astype(np.float32))
    refs = jnp.asarray(rng.standard_normal((K, NX, NX)).astype(np.float32))
    tables = fs.FusedTables(cfg)
    params = AlignParams.zeros(N)
    rfw = prepare_ref_spectra(refs, cfg)

    img_t = translate_bilinear_mm(imgs, params.shift_x, params.shift_y)
    img_p = jnp.zeros((N, tables.hp, 128), jnp.float32)
    img_p = img_p.at[:, :NX, :NX].set(img_t)
    re = jnp.real(rfw); im = jnp.imag(rfw)
    refp = jnp.zeros((cfg.ring_num, K, 2 * FP), jnp.float32)
    refp = refp.at[:, :, :F].set(jnp.swapaxes(re, 0, 1))
    refp = refp.at[:, :, FP:FP + F].set(jnp.swapaxes(im, 0, 1))
    args = (img_p, jnp.asarray(tables.wxt_rb),
            tuple(jnp.asarray(w) for w in tables.wyts),
            jnp.asarray(tables.dft), refp, jnp.asarray(tables.irf),
            jnp.asarray(tables.prio_table(K)))

    modes = sys.argv[1:] or ["full", "no_ccf", "no_yred", "no_dft",
                             "sample_only", "v2:dense", "v2:slab"]
    ref_out = None
    for mode in modes:
        if mode.startswith("v2:"):
            spec = mode[3:]
            nt = NT
            if "@" in spec:
                spec, nt = spec.split("@"); nt = int(nt)
            call = jax.jit(build_v2(spec, tables, K, nt=nt))
        elif mode.startswith("v3:"):
            call = jax.jit(build_v3(mode[3:], tables, K))
        elif mode == "v5":
            refp256, rny, oh, dftt, irft = v5_inputs(
                tables, args[4], K, cfg.ring_num)
            c5 = jax.jit(build_v5(tables, K, cfg.ring_num))
            call = lambda *a: c5(a[0], a[1], a[2], dftt, refp256, rny, oh,
                                 irft, a[6])
        else:
            call = jax.jit(build(mode, tables, K))
        out = call(*args); np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(3):
            out = call(*args)
            np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / 3
        note = ""
        flat = np.asarray(out).reshape(-1, 128 + L)
        if mode == "full":
            ref_out = flat
        elif ref_out is not None:
            same = (flat[:, 2] == ref_out[:, 2]).mean()
            dv = np.abs(flat[:, 0] - ref_out[:, 0]).max()
            note = f"  winners== {same*100:.2f}%  val|d|max {dv:.2e}"
        print(f"{mode:12s}: {dt*1e3:7.1f} ms  ({N/dt:8.0f} pps){note}")


if __name__ == "__main__":
    main()
