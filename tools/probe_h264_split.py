#!/usr/bin/env python3
"""Runtime knockout split of the H.264 Phase-B batch on the TPU:
times BatchedPhaseB with stages monkeypatched to identity
(full / nointra / nodeblock / noscan / nointer / nores).

Usage: python tools/probe_h264_split.py [n] [variant ...]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    variants = sys.argv[2:] or ["full"]
    import jax

    repo = pathlib.Path(__file__).resolve().parents[1]
    jax.config.update("jax_compilation_cache_dir",
                      str(repo / "build" / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    data = (repo / "build/bench/h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264 import wavefront as WF
    from m2dec_tpu.codecs.h264.reconstruct import (
        BatchedPhaseB,
        dev_pool_size,
    )

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    plans = []
    while len(plans) < n and dec.decode_picture() == 1:
        plans.append(dec.plans.pop())
    n = len(plans)
    ps = dev_pool_size(dec.sps.num_ref_frames, len(dec.frames))

    orig = (WF.intra_scan, WF.deblock_scan, R.inter_pass,
            R.residual_mb, R.residual_chroma)

    def fake_inter(mv, slot, wp, ry, rcb, rcr, mbw, mbh, xp,
                   y_off=0, used=None, bi_idx=None, nu=None, uni=None,
                   ubi=None):
        nmb = mbw * mbh
        return (xp.zeros((nmb, 16, 16), xp.int32),
                xp.zeros((nmb, 8, 8), xp.int32),
                xp.zeros((nmb, 8, 8), xp.int32))

    for var in variants:
        (WF.intra_scan, WF.deblock_scan, R.inter_pass,
         R.residual_mb, R.residual_chroma) = orig
        R._jitted_recon_blob.cache_clear()
        if var in ("nointra", "noscan"):
            WF.intra_scan = lambda a, b, c, *r, **k: (a, b, c)
        if var in ("nodeblock", "noscan"):
            WF.deblock_scan = lambda a, b, c, *r, **k: (a, b, c)
        if var == "nointer":
            R.inter_pass = fake_inter
        if var == "nores":
            R.residual_mb = lambda c, t, xp, has_i8=True: xp.zeros(
                (c.shape[0], 16, 16), xp.int32)
            R.residual_chroma = lambda c, xp: xp.zeros(
                (c.shape[0], 2, 8, 8), xp.int32)

        ph = BatchedPhaseB(plans[0].mb_w, plans[0].mb_h, ps)
        t0 = time.perf_counter()
        outs = ph.run_async(plans[:n])
        _ = np.asarray(outs[0][n - 1, :1, :1])
        tw = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = ph.run_async(plans[:n])
        _ = np.asarray(outs[0][n - 1, :1, :1])
        tb = time.perf_counter() - t0
        print(f"{var}: warm1 {tw:.1f}s, warm2 {tb:.2f}s "
              f"({tb/n*1000:.0f} ms/pic)", flush=True)


if __name__ == "__main__":
    main()
