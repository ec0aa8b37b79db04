"""Probe: H.265 1080p Phase-B device cost with the level-scheduled
wavefront (round-4 rework of the z-order CTU op fori_loop).

Runs native Phase A (defer mode) over the bench stream, reports the
host-side level-scheduling cost per picture, then dispatches a batch
through H265SeqPhaseB and times it with a MATERIALIZING pull (the
axon relay's block_until_ready returns early; only a 1-element pull
is a trustworthy fence — STATUS.md r3).

Usage: python tools/probe_h265_phaseb.py [batch]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    path = pathlib.Path("build/bench/h265_1920x1088_v1.265")
    data = path.read_bytes()

    from m2dec_tpu.codecs.h265.headers import H265Decoder

    dec = H265Decoder()
    dec.set_data(data)
    dec.begin_decode(backend="native", defer_recon=True)
    t0 = time.perf_counter()
    n = 0
    while dec.decode_picture() == 1 and n < batch:
        n += 1
    ta = time.perf_counter() - t0
    plans = [p for p in dec.plans if p is not None][:batch]
    print(f"phase A: {n} pics in {ta:.2f}s ({n/ta:.2f} fps)")

    # host-side level scheduling cost (per plan)
    from m2dec_tpu.codecs.h265 import reconstruct as RC

    t0 = time.perf_counter()
    for p in plans:
        RC._plan_levels(p)
    tsched = time.perf_counter() - t0
    for p in plans:
        ls, lb, cs, cb = p._levels
        nops = int((np.asarray(p.ops_l)[:, :, 0] & 1).sum())
        ncops = int((np.asarray(p.ops_c)[:, :, 0] & 1).sum())
        print(f"  pic: luma ops {nops} -> {ls.shape[0]} levels x "
              f"{ls.shape[1]}+{lb.shape[1]} lanes; chroma {ncops} -> "
              f"{cs.shape[0]}x{cs.shape[1]}+{cb.shape[1]}")
    print(f"level scheduling: {tsched/len(plans)*1000:.0f} ms/pic host")

    from m2dec_tpu.codecs.h265.reconstruct import H265SeqPhaseB

    p0 = plans[0]
    ph = H265SeqPhaseB(p0.H, p0.W, len(dec.pool), p0.size_log2,
                       p0.pic_width, p0.pic_height)
    t0 = time.perf_counter()
    outs = ph.run_async(plans)
    tdisp = time.perf_counter() - t0
    print(f"dispatch (incl. compile if cold): {tdisp:.1f}s")
    # warm timing with materializing pull
    t0 = time.perf_counter()
    outs = ph.run_async(plans)
    _ = np.asarray(outs[0][len(plans) - 1, 0, 0])  # materializing fence
    tb = time.perf_counter() - t0
    print(f"phase B warm: {tb:.2f}s for {len(plans)} pics "
          f"({tb/len(plans)*1000:.0f} ms/pic, {len(plans)/tb:.2f} fps)")


if __name__ == "__main__":
    main()
