"""Prototype: brute-force template-matmul search engine (measure first).

Hypothesis: the fused Pallas search kernel is VPU-bound at ~174 ms per
8192-particle K=8 S=49 search (tools/fused_ablate.py end-of-r3 map), so
the next algorithmic step is to move the WHOLE ccf table onto the MXU.
The polar ccf is exactly a pixel-domain inner product

    ccf[n, m, s, k, l] = <img_n, T[m, s, k, l]>                     (*)

where T is the bilinear-splat back-projection of the ring-weighted,
angle-rolled polar reference rings, spatially shifted by the integer
search-grid offset:

    T[m,s,k,l][h, w] = sum_q Wy[dy_s][q, h] Wx[dx_s][q, w]
                             * w_r(q) * P_ref[k, m-rolled-by-l][q] / L

(Wy/Wx are the constant tent matrices of ops/polar_mm.py — the SAME
sampling algebra the production matmul path uses, so (*) is exactly the
production ccf table, not an approximation; the 1/L matches ccf_rows'
normalized inverse DFT.)  Per-particle fractional accumulated shifts
stay in the bilinear pre-translate stage exactly as today.

Cost at the bench config (90 px, R=36, L=256, K=8, S=49, N=8192):
window 81x81=6561 px, C=2*49*8*256=200,704 columns ->
2*8192*6561*200704 = 21.6 TFLOP, ~110 ms at v5e bf16 peak — vs the
fused kernel's 174 ms — IF the matmul runs near peak and the argmax
epilogue stays cheap.  This script measures exactly that:

    timeout 580 python tools/template_proto.py [N]

It reports template-build time, matmul+argmax time, and checks the
winning (mirror, shift, ref, angle) against the production matmul
sampler (rotational_shift_search_mm) on a subset.

Upside if it wins: pure-matmul search = partitions under GSPMD (the
mesh path today falls back to the slower DFT matmul sampler because
Pallas custom calls don't partition), and no VMEM geometry gates
(any box size / ring_len / K-chunking).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cryo_ralib_tpu.config import AlignConfig
from cryo_ralib_tpu.ops.polar_mm import polar_resample_mm, tent_rows
from cryo_ralib_tpu.ops.search import prepare_ref_spectra, rotational_shift_search_mm
from cryo_ralib_tpu.params import AlignParams
from cryo_ralib_tpu.utils.profiling import force

NX, K = 90, 8
cfg = AlignConfig(img_dim=NX, ring_num=36, ring_len=256, shift_step=1.0,
                  shift_rng_x=3.0, shift_rng_y=3.0)


def window_geometry(cfg):
    """Central square window covering every ring sample under every grid
    shift plus the bilinear tent: radius ring_num + max_shift + 1."""
    rad = int(np.ceil(cfg.ring_num + max(cfg.shift_rng_x, cfg.shift_rng_y) + 1))
    c = cfg.img_dim // 2
    lo, hi = c - rad, c + rad + 1
    assert lo >= 0 and hi <= cfg.img_dim, "window exceeds image"
    return lo, hi - lo  # start, width (odd)


def base_tents(cfg, lo, width):
    """Zero-shift tent matrices over the window: (Q, width) each."""
    coords = cfg.polar_coords
    c = cfg.img_dim // 2
    py = coords[..., 1].reshape(-1)
    px = coords[..., 0].reshape(-1)
    wy = tent_rows(c - lo + py, width)
    wx = tent_rows(c - lo + px, width)
    # all samples interior: tents never touch the window edge
    assert wy[:, 0].max() == 0 and wy[:, -1].max() == 0
    assert wx[:, 0].max() == 0 and wx[:, -1].max() == 0
    return wy, wx


def build_templates(refs, cfg, lo, width, pad):
    """(C, width*width) bf16 template matrix, C ordered [m][s][k][l].

    refs: (K, H, W) f32 device array.  jittable; rebuilt per iteration in
    a real driver (refs change)."""
    ring_len = cfg.ring_len
    r_num = cfg.ring_num
    k_num = refs.shape[0]
    pol = polar_resample_mm(refs, cfg)                      # (K, R, L)
    # no 1/L: ccf_rows' normalized inverse DFT exactly cancels the
    # unnormalized forward's L factor, so production rows ARE the plain
    # sum_t s[t] r[t+l]
    pol = pol * jnp.asarray(cfg.ring_weights)[None, :, None]
    # orig channel: V[l, t] = pol[(t+l) % L]; mirr: pol[(-l-t) % L]
    t_idx = np.arange(ring_len)
    roll_idx = (t_idx[:, None] + t_idx[None, :]) % ring_len  # (Lout, Lt)
    orig = jnp.take(pol, jnp.asarray(roll_idx), axis=-1)     # (K, R, Lo, Lt)
    rev = jnp.take(pol, jnp.asarray((-t_idx) % ring_len), axis=-1)
    mirr = jnp.take(rev, jnp.asarray(roll_idx), axis=-1)
    v = jnp.stack([orig, mirr])                              # (M, K, R, Lo, Lt)
    v = v.transpose(0, 1, 3, 2, 4).reshape(2 * k_num * ring_len,
                                           r_num * ring_len)
    wy, wx = base_tents(cfg, lo, width)
    splat = jnp.einsum("qh,qw->qhw", jnp.asarray(wy), jnp.asarray(wx))
    splat = splat.reshape(-1, width * width).astype(jnp.bfloat16)
    tb = jnp.dot(v.astype(jnp.bfloat16), splat,
                 preferred_element_type=jnp.float32)         # (M*K*L, Wpx)
    tb = tb.reshape(2, k_num, ring_len, width, width)
    tbp = jnp.pad(tb, ((0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)))
    # x-major shift order: sidx = xi * n_dy + yi (config.shifts)
    slabs = []
    for dx in cfg.shift_x_vals:
        for dy in cfg.shift_y_vals:
            dyi, dxi = int(round(float(dy))), int(round(float(dx)))
            s = jax.lax.slice(
                tbp, (0, 0, 0, pad - dyi, pad - dxi),
                (2, k_num, ring_len, pad - dyi + width, pad - dxi + width))
            slabs.append(s.astype(jnp.bfloat16))
    tm = jnp.stack(slabs, axis=1)  # (M, S, K, L, width, width)
    return tm.reshape(2 * len(slabs) * k_num * ring_len, width * width)


def splat_spectra(cfg, lo, width):
    """Constant (R, F, Wpx) rfft-over-t spectra of the splat tensor —
    refs-independent, computed once per config."""
    from cryo_ralib_tpu.ops.dft import rfft_mm

    wy, wx = base_tents(cfg, lo, width)
    splat = jnp.einsum("qh,qw->qhw", jnp.asarray(wy), jnp.asarray(wx))
    splat = splat.reshape(cfg.ring_num, cfg.ring_len, width * width)
    # rfft along t (axis=1): move to last, transform, move back
    sf = rfft_mm(splat.transpose(0, 2, 1))       # (R, Wpx, F) complex64
    return sf.transpose(0, 2, 1)                  # (R, F, Wpx)


def build_templates_freq(refs, cfg, sf, lo, width, pad):
    """Frequency-domain template build: correlation over the ring angle
    t becomes a per-frequency product against the precomputed splat
    spectra, so the per-iteration work is two small r-contractions and
    one inverse-DFT matmul (no L x L roll materialization).

    tb_orig[k,l,px] = sum_r irfft(WP[k,r]*conj(SF[r,:,px]))[l]
    tb_mirr[k,l,px] = sum_r irfft(WP[k,r]*SF[r,:,px])[-l % L]
    """
    from cryo_ralib_tpu.ops.dft import irfft_mm, rfft_mm

    ring_len = cfg.ring_len
    k_num = refs.shape[0]
    pol = polar_resample_mm(refs, cfg)
    wpol = pol * jnp.asarray(cfg.ring_weights)[None, :, None]
    wp = rfft_mm(wpol)                            # (K, R, F)
    g = jnp.einsum("krf,rfp->kpf", wp, jnp.conj(sf))
    h = jnp.einsum("krf,rfp->kpf", wp, sf)
    tbo = irfft_mm(g, n=ring_len)                 # (K, Wpx, L)
    tbm = irfft_mm(h, n=ring_len)
    # index reversal (-l % L) = flip + roll (copies, not a gather)
    tbm = jnp.roll(jnp.flip(tbm, axis=-1), 1, axis=-1)
    tb = jnp.stack([tbo, tbm]).transpose(0, 1, 3, 2)   # (M, K, L, Wpx)
    tb = tb.reshape(2, k_num, ring_len, width, width).astype(jnp.bfloat16)
    tbp = jnp.pad(tb, ((0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)))
    slabs = []
    for dx in cfg.shift_x_vals:
        for dy in cfg.shift_y_vals:
            dyi, dxi = int(round(float(dy))), int(round(float(dx)))
            s = jax.lax.slice(
                tbp, (0, 0, 0, pad - dyi, pad - dxi),
                (2, k_num, ring_len, pad - dyi + width, pad - dxi + width))
            slabs.append(s)
    tm = jnp.stack(slabs, axis=1)
    return tm.reshape(2 * len(slabs) * k_num * ring_len, width * width)


def search_template(img_win, tm, n_chunks):
    """(N, Wpx) bf16 imgs x (C, Wpx) bf16 templates -> best val/index.

    Chunked over C with a running online argmax (ascending chunk order =
    first-max-wins priority, same as the flat table argmax)."""
    n = img_win.shape[0]
    c_total = tm.shape[0]
    chunk = c_total // n_chunks
    assert chunk * n_chunks == c_total

    def body(i, carry):
        best_val, best_idx = carry
        cols = jax.lax.dynamic_slice(tm, (i * chunk, 0),
                                     (chunk, tm.shape[1]))
        scores = jnp.dot(img_win, cols.T,
                         preferred_element_type=jnp.float32)  # (N, chunk)
        v = jnp.max(scores, axis=1)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32) + i * chunk
        take = v > best_val
        return jnp.where(take, v, best_val), jnp.where(take, a, best_idx)

    init = (jnp.full((n,), -3.0e38, jnp.float32),
            jnp.zeros((n,), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 49
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((n, NX, NX)).astype(np.float32)
    refs = rng.standard_normal((K, NX, NX)).astype(np.float32)
    lo, width = window_geometry(cfg)
    pad = int(np.ceil(max(cfg.shift_rng_x, cfg.shift_rng_y)))
    print(f"window [{lo}:{lo+width}) width={width} pad={pad} "
          f"C={2*cfg.n_shifts*K*cfg.ring_len}")

    refs_d = jnp.asarray(refs)
    sf = splat_spectra(cfg, lo, width)
    force(jnp.real(sf[0, 0, :2]))
    build = jax.jit(lambda r, s: build_templates_freq(r, cfg, s, lo, width,
                                                      pad))
    t0 = time.time()
    tm = build(refs_d, sf)
    force(tm[:2, :2])
    t_build_cold = time.time() - t0
    t0 = time.time()
    tm = build(refs_d, sf)
    force(tm[:2, :2])
    t_build = time.time() - t0
    print(f"template build (freq): cold {t_build_cold:.2f}s warm "
          f"{t_build*1e3:.1f}ms TM {tm.shape} {tm.size*2/1e9:.2f} GB bf16")
    # cross-check against the direct roll build
    if n <= 1024:
        tm2 = jax.jit(lambda r: build_templates(r, cfg, lo, width, pad))(refs_d)
        err = float(jnp.max(jnp.abs(tm.astype(jnp.float32)
                                    - tm2.astype(jnp.float32))))
        ref_mag = float(jnp.max(jnp.abs(tm2.astype(jnp.float32))))
        print(f"freq-vs-roll build max abs diff {err:.4g} (max {ref_mag:.4g})")

    win = jnp.asarray(
        imgs[:, lo:lo + width, lo:lo + width].reshape(n, -1)
    ).astype(jnp.bfloat16)
    # build-stage breakdown (each stage timed via truncated jit replays)
    if n > 1024:
        from functools import partial as _p

        def upto(stage, r, s):
            pol = polar_resample_mm(r, cfg)
            wpol = pol * jnp.asarray(cfg.ring_weights)[None, :, None]
            from cryo_ralib_tpu.ops.dft import irfft_mm, rfft_mm
            wp = rfft_mm(wpol)
            if stage == 0:
                return wp
            g = jnp.einsum("krf,rfp->kpf", wp, jnp.conj(s))
            h = jnp.einsum("krf,rfp->kpf", wp, s)
            if stage == 1:
                return g.real + h.real
            tbo = irfft_mm(g, n=cfg.ring_len)
            tbm = irfft_mm(h, n=cfg.ring_len)
            if stage == 2:
                return tbo + tbm
            tbm = jnp.roll(jnp.flip(tbm, axis=-1), 1, axis=-1)
            tb = jnp.stack([tbo, tbm]).transpose(0, 1, 3, 2)
            tb = tb.reshape(2, K, cfg.ring_len, width, width)
            return tb.astype(jnp.bfloat16)
        for stage, name in [(0, "spectra"), (1, "g/h contraction"),
                            (2, "+irfft"), (3, "+rev/transpose/bf16")]:
            f = jax.jit(_p(upto, stage))
            f(refs_d, sf).block_until_ready()
            t0 = time.time()
            force(f(refs_d, sf).ravel()[:2])
            print(f"  build stage {name}: {(time.time()-t0)*1e3:.1f} ms")

    flop = 2.0 * n * width * width * tm.shape[0]
    best = None
    for nc in ([n_chunks] if n <= 1024 else [16, 28, 49, 98, 196]):
        srch = jax.jit(lambda a, b, nc=nc: search_template(a, b, nc))
        t0 = time.time()
        bv, bi = srch(win, tm)
        force(bv)
        cold = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            bv, bi = srch(win, tm)
            force(bv)
            times.append(time.time() - t0)
        t_ms = sorted(times)[1] * 1e3
        print(f"search nc={nc}: {t_ms:.1f} ms (cold {cold:.1f}s, "
              f"{n/(t_ms/1e3):.0f} pps search-only, "
              f"{flop/(t_ms/1e3)/1e12:.1f} TF/s, "
              f"{flop/(t_ms/1e3)/197e12*100:.0f}% of v5e bf16 peak)")
        if best is None or t_ms < best[0]:
            best = (t_ms, bv, bi)
    bv, bi = best[1], best[2]

    # ---- parity vs the production matmul sampler on a subset
    ns = min(n, 256)
    sub = jnp.asarray(imgs[:ns])
    params = AlignParams.zeros(ns)
    ref_fw = prepare_ref_spectra(refs_d, cfg)
    res = rotational_shift_search_mm(sub, ref_fw, params, cfg, fast=True)
    l_len, s_num = cfg.ring_len, cfg.n_shifts
    bi_np = np.asarray(bi[:ns])
    li = bi_np % l_len
    rest = bi_np // l_len
    ki = rest % K
    rest //= K
    si = rest % s_num
    mi = rest // s_num
    ok = 0
    val_ref = np.asarray(res.best_val)
    val_new = np.asarray(bv[:ns])
    for i in range(ns):
        same = (mi[i] == int(res.best_mirror[i])
                and si[i] == int(res.best_sidx[i])
                and ki[i] == int(res.best_ref[i])
                and li[i] == int(res.best_aidx[i]))
        gap = abs(val_new[i] - val_ref[i]) / max(abs(val_ref[i]), 1e-9)
        if same or gap < 5e-3:
            ok += 1
        elif i < 8 or ok + 8 > i:
            print(f"  mismatch {i}: new (m{mi[i]} s{si[i]} k{ki[i]} l{li[i]}) "
                  f"val {val_new[i]:.4f} vs ref (m{int(res.best_mirror[i])} "
                  f"s{int(res.best_sidx[i])} k{int(res.best_ref[i])} "
                  f"l{int(res.best_aidx[i])}) val {val_ref[i]:.4f}")
    print(f"parity: {ok}/{ns} winners match (or tie within 5e-3)")


if __name__ == "__main__":
    main()
