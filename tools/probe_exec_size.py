#!/usr/bin/env python3
"""Find what bloats the batched Phase-B executable: compile the bench
graph on the CPU backend with an XLA dump and tally constant bytes in
the optimized HLO (plus trace-time constants in the StableHLO)."""
import os
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
DUMP = REPO / "build" / "hlo_dump"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", f"--xla_dump_to={DUMP} --xla_dump_hlo_as_text")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    data = (REPO / "build" / "bench" / "h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264.native_pack import pack_batches

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    while dec.decode_picture() == 1:
        pass
    plans = dec.plans
    print(f"{len(plans)} plans, {dec.max_x}x{dec.max_y} MBs",
          file=sys.stderr)
    blobs, layout, pals_list, has_i8, deblock = pack_batches([plans])
    blob, pals = blobs[0], pals_list[0]
    cur_idx = np.array([p.cur_idx for p in plans], np.int32)
    batcher = R.get_batched_phase_b(dec.max_x, dec.max_y, len(dec.frames))
    fn = R._jitted_recon_blob(layout, dec.max_x, dec.max_y, has_i8,
                              deblock, False)
    args = (batcher.pool[0], batcher.pool[1], batcher.pool[2],
            blob, pals, cur_idx, batcher.diag)
    lowered = fn.lower(*args)
    txt = lowered.as_text()
    print(f"stablehlo text: {len(txt)/1e6:.1f} MB", file=sys.stderr)
    # trace-time constants
    tot = 0
    for m in re.finditer(r"stablehlo\.constant dense<", txt):
        pass
    # count dense literal sizes by line length heuristic
    big = []
    for line in txt.splitlines():
        if "constant" in line and len(line) > 2000:
            big.append((len(line), line[:160]))
    big.sort(reverse=True)
    print(f"{len(big)} constant lines >2KB text in stablehlo",
          file=sys.stderr)
    for ln, head in big[:10]:
        print(f"  {ln/1e6:.2f}MB-text {head}", file=sys.stderr)

    import time
    t0 = time.time()
    compiled = lowered.compile()
    print(f"CPU compile: {time.time()-t0:.0f}s", file=sys.stderr)
    try:
        print("serialized exec size:",
              sum(len(x) for x in [compiled.runtime_executable().serialize()]),
              file=sys.stderr)
    except Exception as e:
        print("serialize failed:", e, file=sys.stderr)


if __name__ == "__main__":
    main()
