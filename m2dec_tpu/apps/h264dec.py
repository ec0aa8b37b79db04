"""H.264/H.265 decoder CLI (reference src/app/h264dec.cpp parity).

Usage: python -m m2dec_tpu.apps.h264dec [-o out | -O out] [-n N] <in.264>
  -o  raw NV12 output      -O  per-frame MD5 lines
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def _pin_platform():
    """Honor JAX_PLATFORMS=cpu through the config API: this image's
    sitecustomize force-registers the axon TPU platform and wins over
    the plain env var, which would tie CLI runs to the (sometimes
    wedged) TPU tunnel."""
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    _pin_platform()
    ap = argparse.ArgumentParser(prog="h264dec")
    ap.add_argument("-o", dest="raw_out")
    ap.add_argument("-O", dest="md5_out")
    ap.add_argument("-n", dest="frames", type=int, default=0)
    ap.add_argument("--jax", action="store_true",
                    help="reconstruct via the TPU Phase-B graph "
                         "(H.265 only for now)")
    ap.add_argument("infile")
    args = ap.parse_args(argv)

    from m2dec_tpu.runtime.output import cropped_nv12_bytes, frame_md5_line

    data = pathlib.Path(args.infile).read_bytes()
    # codec by extension (reference detect_file, m2decoder.h:236-260)
    if args.infile.endswith((".265", ".hevc", ".h265")):
        from m2dec_tpu.codecs.h265.headers import H265Decoder as Dec
    else:
        from m2dec_tpu.codecs.h264.decoder import H264Decoder as Dec
    dec = Dec()
    dec.set_data(data)
    kw = {}
    if args.jax and args.infile.endswith((".265", ".hevc", ".h265")):
        kw["backend"] = "jax"
    raw = open(args.raw_out, "wb") if args.raw_out else None
    md5 = open(args.md5_out, "wb") if args.md5_out else None
    n = 0
    for frame in dec.decode_all(**kw):
        if raw:
            raw.write(cropped_nv12_bytes(frame))
        if md5:
            md5.write(frame_md5_line(frame))
        n += 1
        if args.frames and n >= args.frames:
            break
    for f in (raw, md5):
        if f:
            f.close()
    print(f"{n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
