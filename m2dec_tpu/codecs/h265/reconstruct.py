"""H.265 Phase-B reconstruction on TPU: one fused jax.jit graph per
picture geometry.

Consumes the H265Plan tensors (codecs/h265/plan.py) plus the frame-pool
stacks and produces the reconstructed, deblocked, SAO-filtered picture
planes, bit-exact with the reference decoder (reference:
src/lib/h265.cpp — the Python decoder in this package is the scalar
executable spec this is verified against).

TPU mapping (see plan.py for why each stage decouples):

* residual: batched inverse DCT/DST as two int matmuls with the
  reference's sat16<7>/sat16<12> stage saturations, all aligned s x s
  tiles of the coefficient plane per size class, variant-selected
  (dconly with the byte-lane wrap quirk / horiz-only / vert-only /
  full / transform-skip) — h265.cpp:1694-2185;
* inter: dense per-4x4-cell MC — 11x11 luma gathers + 8-tap separable
  FIR (all 16 frac phases as tap-table rows, the f0 phase folded in as
  a 64-weight tap so one 2-pass pipeline covers every case), chroma
  4-tap on *emulated packed-uint64 lanes* (two uint32 lanes with
  explicit carry/borrow) replicating interp_chroma's borrow-bias
  arithmetic bit-for-bit — h265.cpp:3386-3551;
* intra: lax.scan wavefront over CTU anti-diagonals d = cx + 2*cy,
  the z-ordered ops of each CTU stepped by an inner fori_loop, every
  lane (CTU on the diagonal) computed in parallel; each op evaluates
  planar/DC/H/V/angular on neighbour lines built with the reference's
  raw/filtered/strong pipelines expressed as index-clamped gathers +
  sliding FIRs (multipix_* in intra.py collapse to these forms);
* deblocking: whole-frame vertical pass then horizontal pass (the
  reference's (-4,-4)-window per-CTU order is exactly this schedule),
  strengths/thresholds from the plan's recorded edge maps;
* SAO: pure per-pixel map over the pre-SAO plane (band LUT / edge
  sign classes), per-CTU parameters broadcast.
"""

from __future__ import annotations

import functools

import numpy as np

from m2dec_tpu.codecs.h265 import residual as _RES
from m2dec_tpu.codecs.h265.intrapos_tables import COEF as _ACOEF
from m2dec_tpu.codecs.h265.intrapos_tables import POS as _APOS

# =====================================================================
# transform matrices (exact integer butterflies -> matrices)
# =====================================================================


def _mk_tmat(size_log2):
    size = 1 << size_log2
    line = _RES._LINE[size_log2]
    T = np.zeros((size, size), np.int32)
    for j in range(size):
        e = [0] * size
        e[j] = 1
        T[:, j] = line(e, 1, lambda v: v)
    return T


def _mk_dmat():
    T = np.zeros((4, 4), np.int32)
    for j in range(4):
        e = [0] * 4
        e[j] = 1
        T[:, j] = _RES._dst_line(e, 1, lambda v: v)
    return T


_TMAT = {2: _mk_tmat(2), 3: _mk_tmat(3), 4: _mk_tmat(4), 5: _mk_tmat(5)}
_DMAT = _mk_dmat()


def _sat16(v, xp):
    return xp.clip(v, -32768, 32767)


def _sat7(v, xp):
    return _sat16((v + 64) >> 7, xp)


def _sat12(v, xp):
    return _sat16((v + 2048) >> 12, xp)


def residual_plane(coef, tu, sizes, xp, with_dst):
    """coef [H,W] int, tu meta [H/4,W/4] -> residual [H,W] int32.

    Replicates transform/skip_transform variant selection
    (residual.py:314-377) on sanitized coefficient tiles."""
    H, W = coef.shape
    res = xp.zeros((H, W), xp.int32)
    coef = coef.astype(xp.int32)
    for si, s in enumerate(sizes):
        sl2 = s.bit_length() - 1
        T = xp.asarray(_TMAT[sl2])
        N1, N2 = H // s, W // s
        tiles = coef.reshape(N1, s, N2, s).transpose(0, 2, 1, 3)
        meta = tu[:: s >> 2, :: s >> 2]
        present = (meta & 1) != 0
        match = present & (((meta >> 1) & 3) == sl2 - 2)
        variant = (meta >> 3) & 3
        # full 2-D: V = sat7(T @ C); out = sat12(V @ T^T)
        V = _sat7(xp.einsum("ky,abyx->abkx", T, tiles), xp)
        full = _sat12(xp.einsum("abyk,xk->abyx", V, T), xp)
        # dc-only with byte-lane wrap (m2d.h:307-326 semantics)
        c00 = tiles[:, :, 0, 0]
        adj = (c00 + 64) >> 7
        lane = xp.abs(adj) & 0xFF
        dcr = xp.where(adj < 0, -lane, lane)[:, :, None, None]
        dcr = xp.broadcast_to(dcr, tiles.shape)
        # horiz-only: pretruncated first row, one sat12 pass, rows equal
        pre = (tiles[:, :, 0, :] + 1) >> 1
        hrow = _sat12(xp.einsum("xk,abk->abx", T, pre), xp)
        hfull = xp.broadcast_to(hrow[:, :, None, :], tiles.shape)
        # vert-only: sat7 column pass then (v+32)>>6, cols equal
        vcol = _sat7(xp.einsum("yk,abk->aby", T, tiles[:, :, :, 0]), xp)
        vcol = (vcol + 32) >> 6
        vfull = xp.broadcast_to(vcol[:, :, :, None], tiles.shape)
        r = xp.where((variant == 0)[:, :, None, None], dcr,
            xp.where((variant == 1)[:, :, None, None], hfull,
            xp.where((variant == 2)[:, :, None, None], vfull, full)))
        if s == 4 and with_dst:
            D = xp.asarray(_DMAT)
            Vd = _sat7(xp.einsum("ky,abyx->abkx", D, tiles), xp)
            dfull = _sat12(xp.einsum("abyk,xk->abyx", Vd, D), xp)
            dst = ((meta >> 5) & 1) != 0
            r = xp.where(dst[:, :, None, None], dfull, r)
        if s == 4:
            tsk = ((meta >> 6) & 1) != 0
            r = xp.where(tsk[:, :, None, None], (tiles + 16) >> 5, r)
        r = xp.where(match[:, :, None, None], r, 0)
        res = res + r.transpose(0, 2, 1, 3).reshape(H, W)
    return res


# =====================================================================
# inter prediction: dense per-4x4-cell MC
# =====================================================================

#: 8-tap rows over offsets -3..+4 per quarter-pel phase (interp_luma
#: _fir1/_fir2/_fir3, h265.cpp:3193-3241; phase 0 = 64 at offset 0 so
#: the unified 2-pass pipeline scales every case to shift 12)
_LTAP = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], np.int32)


def _luma_cell_mc(refs, slot, x0, y0, mvx, mvy, pic_w, pic_h, xp):
    """[B] cells -> [B,4,4] full-precision 2-pass FIR values (scale
    2^12; uni store = (v+2048)>>12 clip, bidir lane = v>>6)."""
    xpos = x0 + (mvx >> 2)
    ypos = y0 + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    # window rows/cols: sample + (-3..+4) for 4 samples -> -3..+7 (11)
    ar11 = xp.arange(-3, 8)
    ys = xp.clip(ypos[:, None] + ar11[None, :], 0, pic_h - 1)
    xs = xp.clip(xpos[:, None] + ar11[None, :], 0, pic_w - 1)
    s = xp.clip(slot, 0, refs.shape[0] - 1)
    g = refs[s[:, None, None], ys[:, :, None], xs[:, None, :]]
    g = g.astype(xp.int32)  # [B,11,11]
    tapx = xp.asarray(_LTAP)[fx]  # [B,8]
    tapy = xp.asarray(_LTAP)[fy]
    # horizontal: hv[b, r, dx] = sum_j g[b, r, dx+j] * tapx[b, j]
    hv = xp.zeros(g.shape[:2] + (4,), xp.int32)
    for j in range(8):
        hv = hv + g[:, :, j : j + 4] * tapx[:, j, None, None]
    out = xp.zeros((g.shape[0], 4, 4), xp.int32)
    for j in range(8):
        out = out + hv[:, j : j + 4, :] * tapy[:, j, None, None]
    return out


_CTAP = np.array([
    (0, 64, 0, 0), (2, 58, 10, 2), (4, 54, 16, 2), (6, 46, 28, 4),
    (4, 36, 36, 4), (4, 28, 46, 6), (2, 16, 54, 4), (2, 10, 58, 2),
], np.int32)

_U32 = None  # set lazily per xp


def _chroma_cell_mc(refs_cb, refs_cr, slot, cx0, cy0, mvx, mvy, cw, ch,
                    xp):
    """[B] cells -> (cb, cr) [B,2,2] signed lane values before the
    store shift, replicating interp_chroma's packed-uint64 arithmetic
    (h265.cpp:3475-3551) with two uint32 lanes + explicit carries."""
    u32 = xp.uint32
    i32 = xp.int32
    cxpos = cx0 + (mvx >> 3)
    cypos = cy0 + (mvy >> 3)
    fx = mvx & 7
    fy = mvy & 7
    c = xp.asarray(_CTAP)[fx].astype(u32)  # [B,4]
    d = xp.asarray(_CTAP)[fy].astype(u32)
    bx = cxpos - 1
    by = cypos - 1
    ar5 = xp.arange(5)
    ys = xp.clip(by[:, None] + ar5[None, :], 0, ch - 1)
    xs = xp.clip(bx[:, None] + ar5[None, :], 0, cw - 1)
    s = xp.clip(slot, 0, refs_cb.shape[0] - 1)
    hi = refs_cb[s[:, None, None], ys[:, :, None], xs[:, None, :]]
    lo = refs_cr[s[:, None, None], ys[:, :, None], xs[:, None, :]]
    hi = hi.astype(u32)  # [B,5,5] cb lane
    lo = lo.astype(u32)  # cr lane
    bias = xp.asarray(np.uint32(0x80000000))
    lomask = xp.asarray(np.uint32(0x07FFFFFF))

    # pass 1: per row r (5), sample x (2): cols x..x+3
    def pack1(x):
        lo_a = (c[:, 1, None] * lo[:, :, x + 1]
                + c[:, 2, None] * lo[:, :, x + 2])
        hi_a = (c[:, 1, None] * hi[:, :, x + 1]
                + c[:, 2, None] * hi[:, :, x + 2])
        lo_b = (c[:, 0, None] * lo[:, :, x]
                + c[:, 3, None] * lo[:, :, x + 3])
        hi_b = (c[:, 0, None] * hi[:, :, x]
                + c[:, 3, None] * hi[:, :, x + 3])
        lo_r = (lo_a | bias) - lo_b  # no borrow possible
        hi_r = hi_a - hi_b  # mod 2^32
        return hi_r, lo_r & lomask  # [B,5]

    p1 = [pack1(x) for x in range(2)]
    h_hi = xp.stack([p1[0][0], p1[1][0]], axis=-1)  # [B,5,2]
    h_lo = xp.stack([p1[0][1], p1[1][1]], axis=-1)

    # pass 2: per output y (2): rows y..y+3; lo < 2^27, d < 128:
    # exact lo->hi carry via 16-bit split of the lo lane
    def mulsum(dk0, h0, dk1, h1):
        hi0, lo0 = h0
        hi1, lo1 = h1
        uu = dk0[:, None] * (lo0 >> 16) + dk1[:, None] * (lo1 >> 16)
        vv = dk0[:, None] * (lo0 & 0xFFFF) + dk1[:, None] * (lo1 & 0xFFFF)
        lo_s = (uu << 16) + vv  # mod 2^32
        carry = (uu + (vv >> 16)) >> 16
        hi_s = dk0[:, None] * hi0 + dk1[:, None] * hi1 + carry
        return hi_s, lo_s

    outs = []
    for y in range(2):
        hA, lA = mulsum(d[:, 1], (h_hi[:, y + 1], h_lo[:, y + 1]),
                        d[:, 2], (h_hi[:, y + 2], h_lo[:, y + 2]))
        hB, lB = mulsum(d[:, 0], (h_hi[:, y], h_lo[:, y]),
                        d[:, 3], (h_hi[:, y + 3], h_lo[:, y + 3]))
        lA = lA | bias
        borrow = (lA < lB).astype(u32)
        wv_lo = lA - lB
        wv_hi = hA - hB - borrow
        cb = wv_hi.astype(i32)
        cr = (wv_lo ^ bias).astype(i32)
        outs.append((cb, cr))
    cb = xp.stack([outs[0][0], outs[1][0]], axis=1)  # [B,2,2]
    cr = xp.stack([outs[0][1], outs[1][1]], axis=1)
    return cb, cr


def _clip255(v, xp):
    return xp.clip(v, 0, 255)


def inter_pass(slot, mv, pool_y, pool_cb, pool_cr, pic_w, pic_h, xp):
    """Dense whole-picture MC from the plan's per-cell slot/mv tensors.

    Returns (mask_cell [ch,cw] bool, mc_y [H,W], mc_cb/[Hc,Wc], mc_cr)
    with mc values already store-rounded+clipped (store_pix semantics,
    h265.cpp:3161-3178)."""
    ch, cw = slot.shape[:2]
    B = ch * cw
    cell = xp.arange(B, dtype=xp.int32)
    x0 = (cell % cw) * 4
    y0 = (cell // cw) * 4
    s0 = slot[:, :, 0].reshape(B).astype(xp.int32)
    s1 = slot[:, :, 1].reshape(B).astype(xp.int32)
    mvf = mv.reshape(B, 2, 2).astype(xp.int32)
    both = (s0 >= 0) & (s1 >= 0)
    p0s = xp.where(s0 >= 0, s0, s1)
    p0mv = xp.where((s0 >= 0)[:, None], mvf[:, 0], mvf[:, 1])
    p1s = xp.where(both, s1, p0s)
    p1mv = xp.where(both[:, None], mvf[:, 1], p0mv)

    def one(sl, mvv):
        ly = _luma_cell_mc(pool_y, sl, x0, y0, mvv[:, 0], mvv[:, 1],
                           pic_w, pic_h, xp)
        cb, cr = _chroma_cell_mc(pool_cb, pool_cr, sl, x0 >> 1, y0 >> 1,
                                 mvv[:, 0], mvv[:, 1], pic_w >> 1,
                                 pic_h >> 1, xp)
        return ly, cb, cr

    y_a, cb_a, cr_a = one(p0s, p0mv)
    y_b, cb_b, cr_b = one(p1s, p1mv)

    both3 = both[:, None, None]

    def store(a, b):
        uni = _clip255((a + 2048) >> 12, xp)
        bi = _clip255(((a >> 6) + (b >> 6) + 64) >> 7, xp)
        return xp.where(both3, bi, uni)

    out_y = store(y_a, y_b)        # [B,4,4]
    out_cb = store(cb_a, cb_b)     # [B,2,2]
    out_cr = store(cr_a, cr_b)
    mask = (s0 >= 0) | (s1 >= 0)
    H, W = ch * 4, cw * 4
    mc_y = out_y.reshape(ch, cw, 4, 4).transpose(0, 2, 1, 3).reshape(H, W)
    mc_cb = (out_cb.reshape(ch, cw, 2, 2).transpose(0, 2, 1, 3)
             .reshape(H >> 1, W >> 1))
    mc_cr = (out_cr.reshape(ch, cw, 2, 2).transpose(0, 2, 1, 3)
             .reshape(H >> 1, W >> 1))
    return mask.reshape(ch, cw), mc_y, mc_cb, mc_cr
