#!/usr/bin/env python3
"""Compile subgraphs of the real picture body with REAL plan tensors
on TPU; report sizes. argv: part names among unpack,residual,inter,
core, else all cheap ones."""
import pathlib
import sys
import time
from collections import Counter

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def hist(ser):
    h = np.frombuffer(ser, np.uint8)
    hw = h[: len(h) // 2 * 2].view(np.uint16)
    cnt = Counter(hw[::8].tolist())
    tot = len(hw[::8])
    return "  ".join(f"0x{v:04x}:{n/tot*100:.0f}%"
                     for v, n in cnt.most_common(4))


def report(name, fn, *args):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    ser = c.runtime_executable().serialize()
    print(f"{name}: compile {time.time()-t0:.1f}s "
          f"exec={len(ser)/1e6:.2f} MB  [{hist(ser)}]",
          file=sys.stderr, flush=True)


def main():
    want = set(sys.argv[1:])
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

    plans = dec.plans[:1]
    blobs, layout, pals_list, has_i8, deblock = pack_batches([plans])
    blob, pals = blobs[0], pals_list[0]
    mbw, mbh = dec.max_x, dec.max_y
    H, W = mbh * 16, mbw * 16
    ps = len(dec.frames)

    def unpack(bl, pl):
        sq = {}
        for k, v in R._unflatten_wire(bl, layout, jnp).items():
            if isinstance(v, dict):
                sq[k] = {kk: vv[0] for kk, vv in v.items()}
            else:
                sq[k] = v[0]
        return R._unpack_wire(sq, jnp, pl)

    if not want or "unpack" in want:
        report("unpack", unpack, blob, pals)

    P = jax.eval_shape(unpack, blob, pals)
    print("unpacked shapes:",
          {k: (v.shape, str(v.dtype)) for k, v in P.items()},
          file=sys.stderr)

    if not want or "residual" in want:
        report("residual", lambda bl, pl: (
            R.residual_mb(unpack(bl, pl)["coef_luma"],
                          unpack(bl, pl)["t8x8"], jnp),
            R.residual_chroma(unpack(bl, pl)["coef_chroma"], jnp)),
            blob, pals)

    if not want or "inter" in want:
        refs = jnp.zeros((ps, H, W), jnp.uint8)
        refc = jnp.zeros((ps, H // 2, W // 2), jnp.uint8)

        def inter(bl, pl, a, b, c):
            Pp = unpack(bl, pl)
            return R.inter_pass(Pp["mv"], Pp["slot"], Pp["wp"], a, b, c,
                                mbw, mbh, jnp)

        report("inter", inter, blob, pals, refs, refc, refc)


if __name__ == "__main__":
    main()
