"""Mid-stream resolution change (SURVEY §3.5): the reference's
header-callback reallocation (SPS dispatch h264.cpp:885-891 ->
M2Decoder::SetFrames, m2decoder.h:54-80) differentially verified
byte-for-byte against the compiled reference binary.

Covered behaviors:
* growing switch: the pool is insufficient -> reallocated; frames
  pending in the DPB at the switch drain as ZERO-BYTE outputs (the
  reference's writer produces empty-md5 lines for them);
* shrinking switch: the pool stays sufficient -> kept, content intact;
  pending frames drain at their own decode-time dimensions while new
  pictures decode into lazily re-shaped slots;
* same-geometry SPS re-send: no-op;
* multiple switches in one stream.
"""

import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from streamgen.h264_enc import H264BGen, H264InterGen  # noqa: E402

from m2dec_tpu.codecs.h264.decoder import H264Decoder  # noqa: E402
from m2dec_tpu.runtime.output import cropped_nv12_bytes  # noqa: E402


def golden_of(reference_bins, data, tmp_path):
    (tmp_path / "in.264").write_bytes(data)
    subprocess.run([str(reference_bins["h264dec"]), "-o", "in.264"],
                   cwd=tmp_path, capture_output=True, check=True)
    return (tmp_path / "in.out").read_bytes()


def run_serial(data):
    dec = H264Decoder()
    dec.set_data(data)
    return b"".join(cropped_nv12_bytes(f) for f in dec.decode_all())


def run_native(data):
    dec = H264Decoder(native=True, phase_b="np")
    dec.set_data(data)
    return b"".join(cropped_nv12_bytes(f) for f in dec.decode_all())


def run_turbo(data):
    from m2dec_tpu.runtime.turbo import TurboH264Decoder

    t = TurboH264Decoder(data, batch=3)
    return b"".join(cropped_nv12_bytes(f) for f in t.frames())


CASES = {
    "grow": lambda: (H264InterGen(64, 48, seed=5).generate("IPP")
                     + H264InterGen(128, 96, seed=6).generate("IPP")),
    "shrink": lambda: (H264InterGen(128, 96, seed=7).generate("IPP")
                       + H264InterGen(64, 48, seed=8).generate("IPP")),
    "b_then_grow": lambda: (
        H264BGen(80, 48, seed=9, num_ref_frames=2).generate("IPBBP")
        + H264InterGen(112, 64, seed=10).generate("IPP")),
    "same_geometry": lambda: (
        H264InterGen(96, 64, seed=11).generate("IPP")
        + H264InterGen(96, 64, seed=12).generate("IPP")),
    "triple": lambda: (H264InterGen(64, 48, seed=13).generate("IP")
                       + H264InterGen(96, 64, seed=14).generate("IP")
                       + H264InterGen(48, 32, seed=15).generate("IPP")),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_switch_serial(reference_bins, tmp_path, case):
    data = CASES[case]()
    assert run_serial(data) == golden_of(reference_bins, data, tmp_path)


@pytest.mark.parametrize("case", ["grow", "shrink"])
def test_switch_native(reference_bins, tmp_path, case):
    data = CASES[case]()
    assert run_native(data) == golden_of(reference_bins, data, tmp_path)


@pytest.mark.parametrize("case", ["grow", "shrink"])
def test_switch_turbo(reference_bins, tmp_path, case):
    """The overlapped driver splits pending batches at the geometry
    change and rebuilds its batcher (runtime/turbo.py)."""
    data = CASES[case]()
    assert run_turbo(data) == golden_of(reference_bins, data, tmp_path)
