#!/usr/bin/env python3
"""Dump optimized HLO of the wire-unpack program and report the largest
constants / suspicious ops."""
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main():
    data = (REPO / "build" / "bench" / "h264_1920x1088_v1.264").read_bytes()
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264.native_pack import pack_batches

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    while dec.decode_picture() == 1:
        pass
    import jax.numpy as jnp

    plans = dec.plans[:1]
    blobs, layout, pals_list, _, _ = pack_batches([plans])
    blob, pals = blobs[0], pals_list[0]

    def unpack(bl, pl):
        sq = {}
        for k, v in R._unflatten_wire(bl, layout, jnp).items():
            if isinstance(v, dict):
                sq[k] = {kk: vv[0] for kk, vv in v.items()}
            else:
                sq[k] = v[0]
        return R._unpack_wire(sq, jnp, pl)

    c = jax.jit(unpack).lower(blob, pals).compile()
    txt = c.as_text()
    out = REPO / "build" / "unpack_opt.hlo"
    out.write_text(txt)
    print(f"optimized HLO: {len(txt)/1e6:.1f} MB -> {out}",
          file=sys.stderr)
    # largest constant lines
    lines = txt.splitlines()
    big = sorted(((len(ln), i) for i, ln in enumerate(lines)
                  if "constant(" in ln), reverse=True)[:8]
    for ln, i in big:
        print(f"  line {i} len={ln/1e3:.0f}K: {lines[i][:200]}",
              file=sys.stderr)
    # count op kinds
    from collections import Counter
    ops = Counter(m.group(1) for m in re.finditer(
        r"= \S+ (\w+)\(", txt))
    print(ops.most_common(15), file=sys.stderr)


if __name__ == "__main__":
    main()
