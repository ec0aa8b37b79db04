#!/usr/bin/env python3
"""Internal knockout split of the H.264 inter MC on the TPU.

Variants: full, noluma (luma fetch+avg -> zeros), nochroma,
noplanes (half-pel FIR build -> repeat G), nounpack (gather words but
skip byte unpack/phase select).

Usage: python tools/probe_mc_split.py [n] [variant ...]
"""

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

    orig_luma = R._luma_mc_hp
    orig_chroma = R._chroma_mc_ilv
    orig_planes = R._halfpel_planes

    def no_luma(planes4, slot, posx, posy, fracx, fracy, xp, H, W,
                size=4):
        return xp.zeros((slot.shape[0], size, size), xp.int32)

    def no_chroma(refs_ilv_p, slot, posx, posy, fracx, fracy, xp, H, W,
                  size=2):
        z = xp.zeros((slot.shape[0], size, size), xp.int32)
        return z, z

    def no_planes(refs_p, xp):
        P = refs_p.astype(xp.int32)
        return xp.stack([P, P, P, P]).astype(xp.uint8)

    def chroma_gather_only(refs_ilv_p, slot, posx, posy, fracx, fracy,
                           xp, H, W, size=2):
        posy_c = xp.clip(posy, -3, H - 1)
        posx_c = xp.clip(posx, -3, W - 1)
        t = size + 1
        g = R._flat_windows32(refs_ilv_p, slot, posy_c + R._MC_PAD,
                              2 * (posx_c + R._MC_PAD), t, 2 * t, xp)
        z = g[:, 0:size, 0:size].astype(xp.int32) * 0
        return z, z

    for var in variants:
        R._luma_mc_hp = orig_luma
        R._chroma_mc_ilv = orig_chroma
        R._halfpel_planes = orig_planes
        if var == "noluma":
            R._luma_mc_hp = no_luma
        if var == "nochroma":
            R._chroma_mc_ilv = no_chroma
        if var == "noplanes":
            R._halfpel_planes = no_planes
        if var == "nolumachroma":
            R._luma_mc_hp = no_luma
            R._chroma_mc_ilv = no_chroma
        if var == "chromagather":
            R._chroma_mc_ilv = chroma_gather_only
        R._jitted_recon_blob.cache_clear()

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
