#!/usr/bin/env python3
"""Bisect _recon_batch_blob: compile the real batch=1 graph with stages
selectively disabled (monkeypatched to identity). argv: names among
nointra, nodeblock, nointer, nores — each run disables the listed
stages."""
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
    data = (REPO / "build" / "bench" / "h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264 import wavefront as WF
    from m2dec_tpu.codecs.h264.native_pack import pack_batches

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    while dec.decode_picture() == 1:
        pass
    import jax.numpy as jnp

    if "nointra" in off:
        WF.intra_scan = lambda a, b, c, *r, **k: (a, b, c)
    if "nodeblock" in off:
        WF.deblock_scan = lambda a, b, c, *r, **k: (a, b, c)
    if "nointer" in off:
        def fake_inter(mv, slot, wp, ry, rcb, rcr, mbw, mbh, xp,
                       y_off=0, used=None, bi_idx=None):
            n = mbw * mbh
            return (xp.zeros((n, 16, 16), xp.int32),
                    xp.zeros((n, 8, 8), xp.int32),
                    xp.zeros((n, 8, 8), xp.int32))
        R.inter_pass = fake_inter
    if "nores" in off:
        R.residual_mb = lambda c, t, xp: xp.zeros(
            (c.shape[0], 16, 16), xp.int32)
        R.residual_chroma = lambda c, xp: xp.zeros(
            (c.shape[0], 2, 8, 8), xp.int32)

    plans = dec.plans[:1]
    blobs, layout, pals_list, has_i8, deblock = pack_batches([plans])
    blob, pals = blobs[0], pals_list[0]
    cur_idx = np.array([p.cur_idx for p in plans], np.int32)
    H, W = dec.max_y * 16, dec.max_x * 16
    ps = len(dec.frames)
    pool = (jnp.zeros((ps, H, W), jnp.uint8),
            jnp.zeros((ps, H // 2, W // 2), jnp.uint8),
            jnp.zeros((ps, H // 2, W // 2), jnp.uint8))
    diag = R._diag_lanes(dec.max_x, dec.max_y)
    import functools
    fn = jax.jit(functools.partial(
        R._recon_batch_blob, layout=layout, mb_w=dec.max_x,
        mb_h=dec.max_y, has_i8=has_i8, deblock=deblock))
    t0 = time.time()
    c = fn.lower(pool[0], pool[1], pool[2], blob, pals, cur_idx,
                 diag).compile()
    ser = c.runtime_executable().serialize()
    print(f"off={sorted(off)}: compile {time.time()-t0:.1f}s "
          f"exec={len(ser)/1e6:.2f} MB", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
