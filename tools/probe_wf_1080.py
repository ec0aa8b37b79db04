"""Probe: 1080p H.264 Phase-B device cost, Pallas wavefront kernels vs
the XLA scan fallback.

Decodes N pictures of the bench stream through TurboH264Decoder twice
(M2DEC_TPU_WF controls the wavefront tier), timing the warm batch with
a materializing pull, and cross-checks per-frame checksums between the
two modes (the XLA path is the differential-test-verified baseline).

Usage: python tools/probe_wf_1080.py [n_pics] [mode...]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def run(mode, data, n):
    os.environ["M2DEC_TPU_WF"] = mode
    import jax

    from m2dec_tpu.runtime.turbo import TurboH264Decoder

    t = TurboH264Decoder(data, batch=n)
    cks = []
    t0 = time.perf_counter()
    first = None
    for i, (frm, outs, row) in enumerate(t.device_frames()):
        if outs is None:
            continue
        if first is None:
            first = time.perf_counter()
        cks.append(int(np.asarray(outs[0][row].astype("int32").sum())))
        if len(cks) >= n:
            break
    tw = time.perf_counter() - t0
    return cks, tw


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    modes = sys.argv[2:] or ["xla", "pallas"]
    data = pathlib.Path("build/bench/h264_1920x1088_v1.264").read_bytes()
    ref = None
    for mode in modes:
        cks, tw = run(mode, data, n)
        print(f"{mode}: {len(cks)} pics in {tw:.2f}s "
              f"({tw/max(1,len(cks))*1000:.0f} ms/pic incl. phase A + "
              "d2h cks)")
        if ref is None:
            ref = cks
        else:
            print("  checksums match xla:", cks == ref)


if __name__ == "__main__":
    main()
