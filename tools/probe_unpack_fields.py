#!/usr/bin/env python3
"""Compile the wire unpack one field at a time on TPU; report sizes."""
import pathlib
import sys
import time

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
    fields = sorted({p[0] for p, *_ in layout})

    for f in fields:
        lay = tuple(e for e in layout if e[0][0] == f)

        def unpack_one(bl, pl, lay=lay, f=f):
            sq = {}
            for k, v in R._unflatten_wire(bl, lay, jnp).items():
                if isinstance(v, dict):
                    sq[k] = {kk: vv[0] for kk, vv in v.items()}
                else:
                    sq[k] = v[0]
            return R._unpack_wire(sq, jnp, pl)

        t0 = time.time()
        try:
            c = jax.jit(unpack_one).lower(blob, pals).compile()
            ser = c.runtime_executable().serialize()
            print(f"{f}: {time.time()-t0:.1f}s "
                  f"exec={len(ser)/1e6:.2f} MB",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"{f}: FAILED {type(e).__name__} {str(e)[:120]}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
