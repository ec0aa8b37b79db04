"""FAST_DECODE mode: DC-only 1/8-scale MPEG-1/2 reconstruction.

The reference's --enable-fastdec compile mode (configure.ac:34-41) decodes
a 1/8-resolution preview: MB_LEN=2 (mpeg2.h:39-43) makes every macroblock
a 2x2 luma patch plus one CbCr pair, the IDCT collapses to a DC add with
no saturation (mpeg2.cpp:33-39), and motion compensation becomes a
full-pel copy with (mv+8)>>4 rounding (motioncomp.cpp:548-599).  Here it
is a Phase-B variant over the same plan tensors: Phase A is unchanged and
only the reconstruction graph differs.

Semantics replicated exactly (differentially tested vs a -DFAST_DECODE
build of the reference, build/ref/h264dec_fast):
* intra store / inter add are raw uint8 arithmetic -- no clipping, the
  value wraps (m2d_idct_intra_luma / m2d_idct_inter_luma macros);
* only the dequantized DC participates; AC coefficients, mismatch
  control, and MPEG-1 oddification are skipped (parse_coef FAST_DECODE
  guard, mpeg2.cpp:1071-1084) — the plan carries the pre-oddification DC
  in `dc0` for this;
* bidirectional averaging is (fwd+bwd)>>1 with truncation, offsets are
  averaged per-sample after the forward copy (motioncomp.cpp:579-597);
* chroma MC rounds x to a CbCr pair boundary: byte offset
  ((mv/2)+4)>>3 & ~1 on the interleaved plane (motioncomp.cpp:561-567);
* field MC in frame pictures uses a doubled row stride; the fast chroma
  path takes only the first field's vector with src_offset forced to 0
  (mpeg2.cpp:1291-1301 FAST_DECODE branch).  The duplicated luma row
  writes that land below the macroblock are transient in the reference
  (overwritten by the next macroblock row) and are not modelled.
"""

from __future__ import annotations

import functools

import numpy as np


def _ctrunc2(v, xp):
    """C integer division by 2 (truncates toward zero)."""
    return xp.where(v >= 0, v >> 1, -((-v) >> 1))


def _gather(plane, ys, xs, xp):
    h, w = plane.shape
    ys = xp.clip(ys, 0, h - 1)
    xs = xp.clip(xs, 0, w - 1)
    return plane[ys, xs].astype(xp.int32)


def _luma_pred(ref, mvx, mvy, mbx, mby, xp):
    """Frame MC at 1/8 scale: 2x2 full-pel copy (motioncomp.cpp:550-559)."""
    sy = mby * 2 + ((mvy + 8) >> 4)
    sx = mbx * 2 + ((mvx + 8) >> 4)
    d = xp.arange(2, dtype=xp.int32)
    return _gather(ref, sy[:, None, None] + d[None, :, None],
                   sx[:, None, None] + d[None, None, :], xp)


def _chroma_pred(ref, mvx, mvy, mbx, mby, xp):
    """One CbCr sample: x rounds to the pair boundary
    (motioncomp.cpp:561-567)."""
    cx = _ctrunc2(mvx, xp)
    cy = _ctrunc2(mvy, xp)
    sy = mby + ((cy + 8) >> 4)
    sx = mbx + ((((cx + 4) >> 3) & -2) >> 1)
    return _gather(ref, sy, sx, xp)


def _luma_pred_field(ref, mv1, mv2, fsel, mbx, mby, xp):
    """Field MC rows: row i from field-i MV with doubled stride
    (mpeg2.cpp:1291-1294 with the fast luma copy)."""
    rows = []
    for i, mv in enumerate((mv1, mv2)):
        f = (fsel >> i) & 1
        sy = mby * 2 + f + 2 * ((mv[:, 1] + 8) >> 4)
        sx = mbx * 2 + ((mv[:, 0] + 8) >> 4)
        d = xp.arange(2, dtype=xp.int32)
        rows.append(_gather(ref, sy[:, None], sx[:, None] + d[None, :], xp))
    return xp.stack(rows, axis=1)  # [N, 2, 2]


def _chroma_pred_field(ref, mv1, mv2, fsel, mbx, mby, xp):
    """Fast field chroma: field-0 MV only, no field offset, row step 2
    (mpeg2.cpp:1295-1301 FAST_DECODE branch)."""
    cx = _ctrunc2(mv1[:, 0], xp)
    cy = _ctrunc2(mv1[:, 1], xp)
    sy = mby + 2 * ((cy + 8) >> 4)
    sx = mbx + ((((cx + 4) >> 3) & -2) >> 1)
    return _gather(ref, sy, sx, xp)


def reconstruct_fast_arrays(
    intra, fwd, bwd, mvf, mvb, dc0,
    ref0_y, ref0_cb, ref0_cr, ref1_y, ref1_cb, ref1_cr,
    *, mb_w, mb_h, xp,
    mvf2=None, mvb2=None, fsel=None, fieldmc=None,
):
    """DC-only reconstruction onto (mb_h*2, mb_w*2) luma and
    (mb_h, mb_w) chroma planes."""
    n = mb_w * mb_h
    i32 = xp.int32
    idx = xp.arange(n, dtype=i32)
    mbx = idx % mb_w
    mby = idx // mb_w
    has_field = fieldmc is not None

    def pred(rf, rb, framefn, fieldfn, shape_blk):
        pf = framefn(rf, mvf[:, 0], mvf[:, 1], mbx, mby, xp)
        pb = framefn(rb, mvb[:, 0], mvb[:, 1], mbx, mby, xp)
        if has_field:
            pf_f = fieldfn(rf, mvf, mvf2, fsel & 3, mbx, mby, xp)
            pb_f = fieldfn(rb, mvb, mvb2, (fsel >> 2) & 3, mbx, mby, xp)
            fm = fieldmc.reshape((n,) + (1,) * (pf.ndim - 1))
            pf = xp.where(fm, pf_f, pf)
            pb = xp.where(fm, pb_f, pb)
        f3 = fwd.reshape((n,) + (1,) * (pf.ndim - 1))
        b3 = bwd.reshape((n,) + (1,) * (pf.ndim - 1))
        return xp.where(f3 & b3, (pf + pb) >> 1, xp.where(b3, pb, pf))

    pred_y = pred(ref0_y, ref1_y, _luma_pred, _luma_pred_field, 2)
    pred_cb = pred(ref0_cb, ref1_cb, _chroma_pred, _chroma_pred_field, 1)
    pred_cr = pred(ref0_cr, ref1_cr, _chroma_pred, _chroma_pred_field, 1)

    res = (dc0.astype(i32) + 4) >> 3  # [N, 6] DC-only IDCT
    res_y = res[:, :4].reshape(n, 2, 2)
    intra3 = intra[:, None, None]
    out_y = xp.where(intra3, res_y, pred_y + res_y) & 0xFF
    out_cb = xp.where(intra, res[:, 4], pred_cb + res[:, 4]) & 0xFF
    out_cr = xp.where(intra, res[:, 5], pred_cr + res[:, 5]) & 0xFF

    y = (out_y.reshape(mb_h, mb_w, 2, 2).transpose(0, 2, 1, 3)
         .reshape(mb_h * 2, mb_w * 2).astype(xp.uint8))
    return (y, out_cb.reshape(mb_h, mb_w).astype(xp.uint8),
            out_cr.reshape(mb_h, mb_w).astype(xp.uint8))


@functools.lru_cache(maxsize=8)
def _jitted_fast(mb_w, mb_h, has_field):
    import jax
    import jax.numpy as jnp

    if has_field:
        def fn(intra, fwd, bwd, mvf, mvb, dc0,
               r0y, r0cb, r0cr, r1y, r1cb, r1cr, mvf2, mvb2, fsel, fieldmc):
            return reconstruct_fast_arrays(
                intra, fwd, bwd, mvf, mvb, dc0,
                r0y, r0cb, r0cr, r1y, r1cb, r1cr,
                mb_w=mb_w, mb_h=mb_h, xp=jnp,
                mvf2=mvf2, mvb2=mvb2, fsel=fsel, fieldmc=fieldmc)
    else:
        def fn(intra, fwd, bwd, mvf, mvb, dc0,
               r0y, r0cb, r0cr, r1y, r1cb, r1cr):
            return reconstruct_fast_arrays(
                intra, fwd, bwd, mvf, mvb, dc0,
                r0y, r0cb, r0cr, r1y, r1cb, r1cr,
                mb_w=mb_w, mb_h=mb_h, xp=jnp)
    return jax.jit(fn)


def reconstruct_picture_fast(plan, ref0, ref1, backend="jax"):
    """Fast-mode reconstruct_picture: same plan/ref interface, coarse
    planes out."""
    args = (
        plan.intra, plan.fwd, plan.bwd,
        plan.mvf.astype(np.int32), plan.mvb.astype(np.int32), plan.dc0,
        ref0["y"], ref0["cb"], ref0["cr"],
        ref1["y"], ref1["cb"], ref1["cr"],
    )
    has_field = plan.fieldmc is not None and bool(plan.fieldmc.any())
    fargs = (plan.mvf2.astype(np.int32), plan.mvb2.astype(np.int32),
             plan.fsel.astype(np.int32), plan.fieldmc) if has_field else ()
    if backend == "numpy":
        kw = dict(mvf2=fargs[0], mvb2=fargs[1], fsel=fargs[2],
                  fieldmc=fargs[3]) if has_field else {}
        y, cb, cr = reconstruct_fast_arrays(
            *args, mb_w=plan.mb_w, mb_h=plan.mb_h, xp=np, **kw)
    else:
        y, cb, cr = _jitted_fast(plan.mb_w, plan.mb_h, has_field)(
            *args, *fargs)
        y, cb, cr = np.asarray(y), np.asarray(cb), np.asarray(cr)
    return {"y": y, "cb": cb, "cr": cr}
