"""Threaded pipeline (reference threadplayer.cpp parity): output identity
with the plain decode loop over all three input kinds + timing trace."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from streamgen.h264_enc import H264InterGen  # noqa: E402
from streamgen.mpeg2_enc import Mpeg2StreamGen  # noqa: E402
from streamgen.ps_mux import mux_ps_aligned  # noqa: E402

from m2dec_tpu.codecs.h264.decoder import H264Decoder  # noqa: E402
from m2dec_tpu.codecs.mpeg2.decoder import Mpeg2Decoder  # noqa: E402
from m2dec_tpu.runtime.output import cropped_nv12_bytes  # noqa: E402
from m2dec_tpu.runtime.pipeline import Pipeline  # noqa: E402


def _run(pipe):
    out = []
    pipe.run(lambda f: out.append(cropped_nv12_bytes(f)))
    return out


def test_pipeline_mpeg2_and_ps():
    es = Mpeg2StreamGen(48, 32, seed=1).generate("IPBBPI")
    dec = Mpeg2Decoder()
    dec.set_data(es)
    ref = [cropped_nv12_bytes(f) for f in dec.decode_all()]
    assert _run(Pipeline(es)) == ref
    p = Pipeline(mux_ps_aligned(es))
    assert _run(p) == ref
    csv = p.timeline_csv()
    assert all(len(r.split(",")) == 3 for r in csv.strip().splitlines())


def test_pipeline_h264():
    es = H264InterGen(48, 32, seed=2).generate("IPPI")
    dec = H264Decoder()
    dec.set_data(es)
    ref = [cropped_nv12_bytes(f) for f in dec.decode_all()]
    assert _run(Pipeline(es)) == ref


def test_pipeline_h265(reference_bins, tmp_path):
    """Pipeline facade auto-detects and decodes H.265 elementary streams
    (M2Decoder codec-switch parity, m2decoder.h:236-260)."""
    import subprocess

    from streamgen.h265_enc import H265StreamGen
    from m2dec_tpu.runtime.pipeline import Pipeline
    from m2dec_tpu.runtime.output import cropped_nv12_bytes

    data = H265StreamGen(64, 48, seed=3).generate(2)
    src = tmp_path / "in.265"
    src.write_bytes(data)
    subprocess.run([str(reference_bins["h264dec"]), "-o", "in.265"],
                   cwd=tmp_path, capture_output=True)
    golden = (tmp_path / "in.out").read_bytes()
    p = Pipeline(data)
    assert p.codec == "h265"
    frames = []
    p.run(frames.append)
    ours = b"".join(cropped_nv12_bytes(f) for f in frames)
    assert ours == golden


def test_terminal_displays_and_timingchart():
    """Display tier (aadisp/display.cpp analogs) renders frames to
    text; timingchart.py renders the LogDump CSV as SVG."""
    import io

    from m2dec_tpu.runtime.display import AnsiDisplay, AsciiDisplay
    from m2dec_tpu.runtime.pipeline import Pipeline

    data = Mpeg2StreamGen(48, 32, seed=1).generate("IPP")
    pipe = Pipeline(data)
    frames = []
    assert pipe.run(frames.append) == 3
    buf = io.StringIO()
    AsciiDisplay(out=buf, max_size=(40, 12)).show(frames[0])
    art = buf.getvalue()
    assert len(art.splitlines()) >= 4
    assert set(art) - set(" .:-=+*#%@\n") == set()
    buf2 = io.StringIO()
    d = AnsiDisplay(out=buf2, max_size=(20, 10))
    d.show(frames[0])
    d.show(frames[1])  # second frame repaints in place
    s = buf2.getvalue()
    assert "▀" in s and "\x1b[38;2;" in s and "\x1b[" in s

    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    from timingchart import parse_csv, render_svg

    svg = render_svg(parse_csv(pipe.timeline_csv()))
    assert svg.startswith("<svg") and "rect" in svg


def test_metrics_counters():
    """SURVEY §5.5 metrics registry: decode-rate counters on Pipeline."""
    from streamgen.mpeg2_enc import Mpeg2StreamGen

    from m2dec_tpu.runtime.pipeline import Pipeline

    es = Mpeg2StreamGen(64, 48, seed=3).generate("IPP")
    p = Pipeline(es)
    got = []
    n = p.run(got.append)
    snap = p.metrics.snapshot()
    assert snap["bytes_in"] == len(es)
    assert snap["frames_decoded"] == 3
    assert snap["frames_output"] == n == len(got)
    assert snap.get("decode_errors", 0) == 0
    assert snap["frames_output_per_s"] > 0
    import json

    json.loads(p.metrics.json_line())  # one-line JSON export

    # truncation increments decode_errors (cut mid-picture: strip the
    # last bytes of the final picture's slice data)
    cut = es[: len(es) - 40]
    p2 = Pipeline(cut)
    p2.run(lambda f: None)
    assert p2.metrics.count("decode_errors") >= 1
