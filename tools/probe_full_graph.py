#!/usr/bin/env python3
"""Compile the real batched Phase-B graph (from bench plans) at small
batch sizes on TPU and report executable sizes + content histograms.
argv: batch sizes, default 1."""
import pathlib
import sys
import time
from collections import Counter

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1]
    data = (REPO / "build" / "bench" / "h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264.native_pack import pack_batches

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    while dec.decode_picture() == 1:
        pass
    print("backend:", jax.default_backend(), file=sys.stderr)
    import jax.numpy as jnp

    for B in sizes:
        plans = dec.plans[:B]
        blobs, layout, pals_list, has_i8, deblock = pack_batches([plans])
        blob, pals = blobs[0], pals_list[0]
        cur_idx = np.array([p.cur_idx for p in plans], np.int32)
        H, W = dec.max_y * 16, dec.max_x * 16
        ps = len(dec.frames)
        pool = (jnp.zeros((ps, H, W), jnp.uint8),
                jnp.zeros((ps, H // 2, W // 2), jnp.uint8),
                jnp.zeros((ps, H // 2, W // 2), jnp.uint8))
        diag = R._diag_lanes(dec.max_x, dec.max_y)
        fn = R._jitted_recon_blob(layout, dec.max_x, dec.max_y, has_i8,
                                  deblock, False)
        t0 = time.time()
        c = fn.lower(pool[0], pool[1], pool[2], blob, pals, cur_idx,
                     diag).compile()
        ser = c.runtime_executable().serialize()
        print(f"B={B}: compile {time.time()-t0:.1f}s "
              f"exec={len(ser)/1e6:.2f} MB", file=sys.stderr, flush=True)
        h = np.frombuffer(ser, np.uint8)
        hw = h[: len(h) // 2 * 2].view(np.uint16)
        cnt = Counter(hw[::8].tolist())
        tot = len(hw[::8])
        for v, n in cnt.most_common(6):
            print(f"  0x{v:04x} {n/tot*100:5.1f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
