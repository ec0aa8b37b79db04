"""Probe: 1080p H.264 Phase-B device cost, Pallas wavefront kernels vs
the XLA scan fallback, with the MC-compaction paths.

Drives BatchedPhaseB directly: native Phase A collects 2*N plans, the
first batch warms (compile/cache-load), the second batch is timed with
a MATERIALIZING pull (block_until_ready lies through the axon relay).
Prints a device checksum of the last frame for cross-mode comparison.

Usage: python tools/probe_wf_1080.py [n] [mode]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    mode = sys.argv[2] if len(sys.argv) > 2 else "xla"
    os.environ["M2DEC_TPU_WF"] = mode
    import jax

    repo = pathlib.Path(__file__).resolve().parents[1]
    jax.config.update("jax_compilation_cache_dir",
                      str(repo / "build" / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    data = pathlib.Path("build/bench/h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264.reconstruct import (
        BatchedPhaseB,
        dev_pool_size,
    )

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    plans = []
    t0 = time.perf_counter()
    while len(plans) < n and dec.decode_picture() == 1:
        plans.append(dec.plans.pop())
    ta = time.perf_counter() - t0
    n = len(plans)
    print(f"phase A: {len(plans)} pics in {ta:.2f}s")
    ps = dev_pool_size(dec.sps.num_ref_frames, len(dec.frames))
    ph = BatchedPhaseB(plans[0].mb_w, plans[0].mb_h, ps)

    t0 = time.perf_counter()
    outs = ph.run_async(plans[:n])
    _ = np.asarray(outs[0][n - 1, 0, 0])
    print(f"{mode} batch1 (warm-up, incl. compile/load): "
          f"{time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    outs = ph.run_async(plans[:n])  # same plans: timing-identical
    _ = np.asarray(outs[0][n - 1, 0, 0])
    tb = time.perf_counter() - t0
    ck = int(np.asarray(outs[0].astype("int32").sum()))
    print(f"{mode} batch2 warm: {tb:.2f}s for {n} pics "
          f"({tb/n*1000:.0f} ms/pic) cksum={ck}")


if __name__ == "__main__":
    main()
