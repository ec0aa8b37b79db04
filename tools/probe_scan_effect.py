#!/usr/bin/env python3
"""Same residual-from-blob body, compiled (a) standalone, (b) inside a
length-1 lax.scan — isolates the scan machinery's effect on TPU codegen
size."""
import functools
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
    blobs, layout, pals_list, has_i8, deblock = pack_batches([plans])
    blob, pals = blobs[0], pals_list[0]

    def body(plan_slices, pals):
        P = R._unpack_wire(plan_slices, jnp, pals)
        res_y = R.residual_mb(P["coef_luma"], P["t8x8"], jnp)
        res_c = R.residual_chroma(P["coef_chroma"], jnp)
        return (jnp.clip(res_y, 0, 255).astype(jnp.uint8),
                jnp.clip(res_c, 0, 255).astype(jnp.uint8))

    def standalone(bl, pl):
        w = R._unflatten_wire(bl, layout, jnp)
        sq = jax.tree.map(lambda v: v[0], w)
        return body(sq, pl)

    def scanned(bl, pl):
        w = R._unflatten_wire(bl, layout, jnp)

        def step(carry, xs):
            return carry, body(xs, pl)

        _, outs = jax.lax.scan(step, 0, w)
        return outs

    for name, fn in [("standalone", standalone), ("scanned", scanned)]:
        t0 = time.time()
        c = jax.jit(fn).lower(blob, pals).compile()
        ser = c.runtime_executable().serialize()
        print(f"{name}: {time.time()-t0:.1f}s "
              f"exec={len(ser)/1e6:.2f} MB", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()


def main2():
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
    blobs, layout, pals_list, has_i8, deblock = pack_batches([plans])
    blob, pals = blobs[0], pals_list[0]
    mbw, mbh = dec.max_x, dec.max_y

    def with_assemble(bl, pl):
        w = R._unflatten_wire(bl, layout, jnp)
        sq = jax.tree.map(lambda v: v[0], w)
        P = R._unpack_wire(sq, jnp, pl)
        res_y = R.residual_mb(P["coef_luma"], P["t8x8"], jnp)
        res_c = R.residual_chroma(P["coef_chroma"], jnp)
        is_inter = (P["kind"] == 0)[:, None, None]
        iy = jnp.where(is_inter, jnp.clip(res_y, 0, 255), 0)
        icb = jnp.where(is_inter, jnp.clip(res_c[:, 0], 0, 255), 0)
        icr = jnp.where(is_inter, jnp.clip(res_c[:, 1], 0, 255), 0)
        y = R._assemble(iy, 16, mbw, mbh, jnp)
        cb = R._assemble(icb, 8, mbw, mbh, jnp)
        cr = R._assemble(icr, 8, mbw, mbh, jnp)
        return y.astype(jnp.uint8), cb.astype(jnp.uint8), cr.astype(jnp.uint8)

    import time as _t
    t0 = _t.time()
    c = jax.jit(with_assemble).lower(blob, pals).compile()
    ser = c.runtime_executable().serialize()
    print(f"with-assemble: {_t.time()-t0:.1f}s exec={len(ser)/1e6:.2f} MB",
          file=sys.stderr, flush=True)


if "assemble" in sys.argv:
    main2()
