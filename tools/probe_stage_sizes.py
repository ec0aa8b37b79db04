#!/usr/bin/env python3
"""Bisect the Phase-B executable bloat: compile each stage of the real
1080p graph separately on the TPU backend and report serialized
executable sizes. Stages are chosen small-to-large; pass stage names as
argv to restrict."""
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

MBW, MBH = 120, 68
H, W = MBH * 16, MBW * 16


def report(name, fn, *args):
    t0 = time.time()
    try:
        c = jax.jit(fn).lower(*args).compile()
        size = len(c.runtime_executable().serialize())
        print(f"{name}: compile {time.time()-t0:.1f}s "
              f"exec={size/1e6:.2f} MB", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"{name}: FAILED {e}", file=sys.stderr, flush=True)


def main():
    from m2dec_tpu.codecs.h264 import wavefront as WF
    from m2dec_tpu.codecs.h264 import reconstruct as R

    print("backend:", jax.default_backend(), file=sys.stderr)
    want = set(sys.argv[1:])

    g = WF.get_geom(MBW, MBH)
    y = jnp.zeros((H, W), jnp.int32)
    cbp = jnp.zeros((H // 2, W // 2), jnp.int32)

    def stage(name):
        return not want or name in want

    if stage("skew"):
        report("skew_luma", lambda p: WF.skew_luma(p, g, jnp), y)
    if stage("unskew"):
        sky = jnp.zeros((WF.MT + H + WF.MB_,
                         WF.ML + g["nd"] * 16 + WF.MR), jnp.int32)
        report("unskew_luma", lambda p: WF.unskew_luma(p, g, jnp), sky)
    if stage("diag_gather"):
        P = {k: jnp.zeros((MBW * MBH,) + s, jnp.int32) for k, s in {
            "kind": (), "res_y": (16, 16), "res_c": (2, 8, 8),
            "i4_modes": (16,), "i4_avail": (16,), "i16_mode": (),
            "chroma_mode": (), "mb_avail": (),
            "deb_str": (2, 4, 4), "deb_str4": (4,),
            "deb_ab": (2, 6, 2)}.items()}
        report("diag_gather",
               lambda Pp: WF.diag_gather(Pp, g, False, True, jnp), P)
    if stage("residual"):
        coef = jnp.zeros((MBW * MBH, 16, 16), jnp.int32)
        t8 = jnp.zeros((MBW * MBH,), jnp.int32)
        report("residual_mb",
               lambda c, t: R.residual_mb(
                   c.reshape(MBW * MBH, 256).reshape(-1, 16, 16)
                   if False else c.reshape(MBW * MBH, -1), t, jnp),
               coef.reshape(MBW * MBH, 256), t8)
    if stage("intra"):
        lmax = g["lmax"]
        nd = g["nd"]
        Pd = {"kind": jnp.zeros((nd, lmax), jnp.int32),
              "res_y": jnp.zeros((nd, lmax, 16, 16), jnp.int32),
              "res_c": jnp.zeros((nd, lmax, 2, 8, 8), jnp.int32),
              "i4_modes": jnp.zeros((nd, lmax, 16), jnp.int32),
              "i4_avail": jnp.zeros((nd, lmax, 16), jnp.int32),
              "i16_mode": jnp.zeros((nd, lmax), jnp.int32),
              "chroma_mode": jnp.zeros((nd, lmax), jnp.int32),
              "mb_avail": jnp.zeros((nd, lmax), jnp.int32)}
        sky = jnp.zeros((WF.MT + H + WF.MB_,
                         WF.ML + nd * 16 + WF.MR), jnp.int32)
        skc = jnp.zeros((WF.MTC + H // 2 + WF.MBC,
                         WF.MLC + nd * 8 + WF.MRC), jnp.int32)
        report("intra_scan",
               lambda a, b, c, Pp: WF.intra_scan(a, b, c, Pp, g, False,
                                                 jnp),
               sky, skc, skc, Pd)
    if stage("deblock"):
        nd = g["nd"]
        lmax = g["lmax"]
        from m2dec_tpu.codecs.h264 import tables as T
        tabs = tuple(jnp.asarray(np.asarray(t, np.int32)) for t in
                     (T.DEBLOCK_ALPHA, T.DEBLOCK_BETA, T.DEBLOCK_TC0))
        Pd = {"deb_str": jnp.zeros((nd, lmax, 2, 4, 4), jnp.int32),
              "deb_str4": jnp.zeros((nd, lmax, 4), jnp.int32),
              "deb_ab": jnp.zeros((nd, lmax, 2, 6, 2), jnp.int32)}
        sky = jnp.zeros((WF.MT + H + WF.MB_,
                         WF.ML + nd * 16 + WF.MR), jnp.int32)
        skc = jnp.zeros((WF.MTC + H // 2 + WF.MBC,
                         WF.MLC + nd * 8 + WF.MRC), jnp.int32)
        report("deblock_scan",
               lambda a, b, c, Pp: WF.deblock_scan(a, b, c, Pp, g, jnp,
                                                   tabs),
               sky, skc, skc, Pd)
    if stage("inter"):
        n = MBW * MBH
        mv = jnp.zeros((n, 16, 2, 2), jnp.int32)
        slot = jnp.zeros((n, 16, 2), jnp.int32)
        wp = jnp.zeros((n, 2, 3, 4), jnp.int32)
        refs = jnp.zeros((4, H, W), jnp.uint8)
        refc = jnp.zeros((4, H // 2, W // 2), jnp.uint8)
        report("inter_pass",
               lambda m, s, w2, a, b, c: R.inter_pass(
                   m, s, w2, a, b, c, MBW, MBH, jnp),
               mv, slot, wp, refs, refc, refc)


if __name__ == "__main__":
    main()
