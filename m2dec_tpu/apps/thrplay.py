"""Threaded pipeline player CLI (reference src/app/threadplayer.cpp parity).

Usage: python -m m2dec_tpu.apps.thrplay [-o out | -O out] [-t trace.csv] <in>
Auto-detects MPEG-2 ES / H.264 / MPEG-PS; decodes through the 3-stage
threaded pipeline and writes raw NV12 or per-frame MD5; -t dumps the
busy/idle stage timeline CSV (unithread.h LogDump format).
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
    ap = argparse.ArgumentParser(prog="thrplay")
    ap.add_argument("-o", dest="raw_out")
    ap.add_argument("-O", dest="md5_out")
    ap.add_argument("-t", dest="trace_out")
    ap.add_argument("-d", "--display", choices=("ansi", "ascii", "none"),
                    default="none",
                    help="terminal display (ansi = truecolor half-blocks,"
                         " ascii = aadisp-style luma art)")
    ap.add_argument("-r", "--rate", type=float, default=0.0,
                    help="display pacing in frames/s (0 = unpaced)")
    ap.add_argument("infile")
    args = ap.parse_args(argv)

    from m2dec_tpu.runtime.display import make_display
    from m2dec_tpu.runtime.output import cropped_nv12_bytes, frame_md5_line
    from m2dec_tpu.runtime.pipeline import Pipeline

    data = pathlib.Path(args.infile).read_bytes()
    pipe = Pipeline(data)
    raw = open(args.raw_out, "wb") if args.raw_out else None
    md5 = open(args.md5_out, "wb") if args.md5_out else None
    disp = make_display(args.display)
    pace = (1.0 / args.rate) if args.rate > 0 else 0.0

    def sink(frame):
        if raw:
            raw.write(cropped_nv12_bytes(frame))
        if md5:
            md5.write(frame_md5_line(frame))
        if disp:
            disp.show(frame)
            if pace:
                import time

                time.sleep(pace)

    n = pipe.run(sink)
    for f in (raw, md5):
        if f:
            f.close()
    if args.trace_out:
        pathlib.Path(args.trace_out).write_text(pipe.timeline_csv())
    print(f"{n} frames ({pipe.codec})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
