#!/usr/bin/env python3
"""Device-side stage timing by ablation: compile the real 12-pic batch
graph with stages disabled and time real executions (trustworthy
block_until_ready on non-donated outs). argv: stage names to DISABLE
among nointra, nodeblock, nointer, nores."""
import functools
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main():
    off = set(sys.argv[1:])
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / "build" / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    data = (REPO / "build" / "bench" / "h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264 import wavefront as WF
    from m2dec_tpu.codecs.h264.native_pack import pack_batches

    if "nointra" in off:
        WF.intra_scan = lambda a, b, c, *r, **k: (a, b, c)
    if "nodeblock" in off:
        WF.deblock_scan = lambda a, b, c, *r, **k: (a, b, c)
    if "nointer" in off:
        def fake_inter(mv, slot, wp, ry, rcb, rcr, mbw, mbh, xp,
                       y_off=0):
            n = mbw * mbh
            return (xp.zeros((n, 16, 16), xp.int32),
                    xp.zeros((n, 8, 8), xp.int32),
                    xp.zeros((n, 8, 8), xp.int32))
        R.inter_pass = fake_inter
    if "nochroma" in off:
        R._chroma_mc = lambda refs_p, slot, posx, posy, fracx, fracy,             xp, H, W: xp.zeros((slot.shape[0], 2, 2), xp.int32)
    if "noluma" in off:
        R._luma_mc_hp = lambda planes4, slot, posx, posy, fracx, fracy,             xp, H, W: xp.zeros((slot.shape[0], 4, 4), xp.int32)
    if "nohp" in off:
        def g_only(planes4, slot, posx, posy, fracx, fracy, xp, H, W):
            flat = planes4[0]
            return R._flat_windows32(
                flat, slot, xp.clip(posy, -9, H + 1) + R._MC_PAD,
                xp.clip(posx, -9, W + 1) + R._MC_PAD, 4, 4, xp)
        R._luma_mc_hp = g_only
    if "onthefly" in off:
        orig_inter = R.inter_pass
        def inter_otf(plan_mv, plan_slot, plan_wp, refs_y, refs_cb,
                      refs_cr, mb_w, mb_h, xp, y_off=0):
            import jax.numpy as jnp
            n = mb_w * mb_h
            B = n * 16
            mb = xp.arange(n, dtype=xp.int32)
            x0 = (mb % mb_w) * 16
            y0 = (mb // mb_w) * 16 + y_off
            blk = xp.arange(16, dtype=xp.int32)
            bx = (x0[:, None] + (blk[None, :] & 3) * 4).reshape(B)
            by = (y0[:, None] + (blk[None, :] >> 2) * 4).reshape(B)
            quad = ((blk >> 3) * 2 + ((blk >> 1) & 1))[None, :]
            quad = xp.broadcast_to(quad, (n, 16)).reshape(B)
            slot = plan_slot.reshape(n, 4, 2)[xp.repeat(mb, 16), quad]
            wp = plan_wp.reshape(n, 4, 3, 4)[xp.repeat(mb, 16), quad]
            mv = plan_mv.reshape(B, 2, 2)
            s0, s1 = slot[:, 0], slot[:, 1]
            both = (s0 >= 0) & (s1 >= 0)
            p0_slot = xp.where(s0 >= 0, s0, s1)
            p0_mv = xp.where((s0 >= 0)[:, None], mv[:, 0], mv[:, 1])
            H, W = refs_y.shape[1], refs_y.shape[2]
            refs_y_p = R._pad_refs_edge(refs_y, xp)
            refs_cb_p = R._pad_refs_edge(refs_cb, xp)
            refs_cr_p = R._pad_refs_edge(refs_cr, xp)
            def pred_one(sl, mvv):
                mvx, mvy = mvv[:, 0], mvv[:, 1]
                py = R._luma_mc(refs_y_p, sl, bx + (mvx >> 2),
                                by + (mvy >> 2), mvx & 3, mvy & 3, xp,
                                H, W)
                cxp = (bx >> 1) + (mvx >> 3)
                cyp = (by >> 1) + (mvy >> 3)
                pcb = R._chroma_mc(refs_cb_p, sl, cxp, cyp, mvx & 7,
                                   mvy & 7, xp, H >> 1, W >> 1)
                pcr = R._chroma_mc(refs_cr_p, sl, cxp, cyp, mvx & 7,
                                   mvy & 7, xp, H >> 1, W >> 1)
                return py, pcb, pcr
            p0y, p0cb, p0cr = pred_one(p0_slot, p0_mv)
            p1y, p1cb, p1cr = pred_one(xp.where(both, s1, p0_slot),
                                       xp.where(both[:, None], mv[:, 1],
                                                p0_mv))
            both3 = both[:, None, None]
            def comb(pi, pa, pb):
                w0 = wp[:, pi, 0][:, None, None]
                w1 = wp[:, pi, 1][:, None, None]
                o = wp[:, pi, 2][:, None, None]
                sφ = wp[:, pi, 3][:, None, None]
                return R._combine_wp(pa, pb, both3, w0, w1, o, sφ, xp)
            out_y = comb(0, p0y, p1y)
            out_cb = comb(1, p0cb, p1cb)
            out_cr = comb(2, p0cr, p1cr)
            pred_y = (out_y.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
                      .reshape(n, 16, 16))
            pred_cb = (out_cb.reshape(n, 4, 4, 2, 2)
                       .transpose(0, 1, 3, 2, 4).reshape(n, 8, 8))
            pred_cr = (out_cr.reshape(n, 4, 4, 2, 2)
                       .transpose(0, 1, 3, 2, 4).reshape(n, 8, 8))
            return pred_y, pred_cb, pred_cr
        R.inter_pass = inter_otf
    if "nores" in off:
        R.residual_mb = lambda c, t, xp: xp.zeros(
            (c.shape[0], 16, 16), xp.int32)
        R.residual_chroma = lambda c, xp: xp.zeros(
            (c.shape[0], 2, 8, 8), xp.int32)

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    while dec.decode_picture() == 1:
        pass
    plans = dec.plans
    cap = R.dev_pool_size(dec.sps.num_ref_frames, len(dec.frames))
    b = R.BatchedPhaseB(dec.max_x, dec.max_y, cap)
    t0 = time.time()
    outs = b.run_async(plans)
    _ = int(np.asarray(outs[0][0, 0, 0]))
    print(f"off={sorted(off)}: first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = None
    for i in range(3):
        t0 = time.time()
        outs = b.run_async(plans)
        _ = int(np.asarray(outs[0][0, 0, 0]))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"off={sorted(off)}: dispatch+exec {best*1e3:.0f} ms "
          f"({best*1e3/len(plans):.1f} ms/pic)", file=sys.stderr)


if __name__ == "__main__":
    main()
