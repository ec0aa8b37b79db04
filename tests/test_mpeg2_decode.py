"""MPEG-1/2 end-to-end bit-exactness: our decoder vs the reference binary.

Randomized conformance streams (tests/streamgen/mpeg2_enc.py) are decoded by
the compiled reference (`h264dec -m -o`, the oracle) and by m2dec_tpu; raw
cropped NV12 output must match byte-for-byte (the reference test.sh
methodology with generated streams instead of a conformance corpus).

Streams carry one trailing dummy picture: the reference CLI longjmps through
a dead frame at end-of-stream (mpeg2.cpp:666 setjmp armed per NAL, invalid
at the final refill) and crashes after flushing all prior frames, so goldens
are validated as a prefix covering every real frame.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from streamgen.mpeg2_enc import Mpeg2StreamGen  # noqa: E402

from m2dec_tpu.codecs.mpeg2.decoder import Mpeg2Decoder  # noqa: E402
from m2dec_tpu.runtime.output import cropped_nv12_bytes, frame_md5_line  # noqa: E402


def oracle_decode(reference_bins, data: bytes, tmp_path, md5=False) -> bytes:
    src = tmp_path / "in.m2v"
    src.write_bytes(data)
    subprocess.run(
        [str(reference_bins["h264dec"]), "-m", "-O" if md5 else "-o", "in.m2v"],
        cwd=tmp_path,
        capture_output=True,
    )
    return (tmp_path / "in.out").read_bytes()


def run_case(reference_bins, tmp_path, gen, pattern, backend="numpy"):
    n_real = len(pattern)
    data = gen.generate(pattern + "I")  # dummy tail flushes real frames
    golden = oracle_decode(reference_bins, data, tmp_path)
    dec = Mpeg2Decoder(backend=backend)
    dec.set_data(data)
    frames = dec.decode_all()
    ours = b"".join(cropped_nv12_bytes(f) for f in frames)
    frame_size = gen.w * gen.h * 3 // 2
    assert len(golden) >= n_real * frame_size, (
        f"oracle produced {len(golden) // frame_size} frames, wanted {n_real}"
    )
    assert ours[: len(golden)] == golden


@pytest.mark.parametrize("seed", range(4))
def test_intra_only(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path, Mpeg2StreamGen(48, 32, seed=seed), "III")


@pytest.mark.parametrize("seed", range(4))
def test_ipb(reference_bins, tmp_path, seed):
    run_case(
        reference_bins, tmp_path, Mpeg2StreamGen(48, 32, seed=seed), "IPBBPBBP"
    )


def test_cif_gop(reference_bins, tmp_path):
    run_case(reference_bins, tmp_path, Mpeg2StreamGen(176, 144, seed=9), "IPBBP")


def test_custom_qmat(reference_bins, tmp_path):
    run_case(
        reference_bins, tmp_path,
        Mpeg2StreamGen(48, 32, seed=5, custom_qmat=True), "IPBP",
    )


def test_fcode3(reference_bins, tmp_path):
    run_case(
        reference_bins, tmp_path, Mpeg2StreamGen(80, 64, seed=6, f_code=3), "IPPBP"
    )


@pytest.mark.parametrize("flags", [
    dict(intra_vlc_format=1, alternate_scan=1),
    dict(q_scale_type=1, intra_dc_precision=2),
])
def test_coding_flag_combos(reference_bins, tmp_path, flags):
    run_case(
        reference_bins, tmp_path, Mpeg2StreamGen(64, 48, seed=7, **flags), "IPB"
    )


@pytest.mark.parametrize("seed", range(2))
def test_mpeg1(reference_bins, tmp_path, seed):
    run_case(
        reference_bins, tmp_path,
        Mpeg2StreamGen(48, 32, seed=seed, mpeg1=True), "IPBBP",
    )


def test_jax_backend(reference_bins, tmp_path):
    """The jit Phase-B path must match the oracle exactly too."""
    run_case(
        reference_bins, tmp_path,
        Mpeg2StreamGen(48, 32, seed=13), "IPBBP", backend="jax",
    )


def test_md5_writer_format(reference_bins, tmp_path):
    """Our MD5 text output matches the reference FileWriterMd5 format."""
    gen = Mpeg2StreamGen(48, 32, seed=2)
    data = gen.generate("II" + "I")
    golden = oracle_decode(reference_bins, data, tmp_path, md5=True)
    dec = Mpeg2Decoder(backend="numpy")
    dec.set_data(data)
    frames = dec.decode_all()
    ours = b"".join(frame_md5_line(f) for f in frames)
    assert ours[: len(golden)] == golden and len(golden) >= 2 * 34


# -- MPEG-PS demux + CLI ------------------------------------------------
from streamgen.ps_mux import mux_ps, mux_ps_aligned  # noqa: E402

from m2dec_tpu.containers.ps import PsDemuxer  # noqa: E402


def test_ps_demux_roundtrip():
    gen = Mpeg2StreamGen(64, 48, seed=5)
    es = gen.generate("IPBBPI")
    assert PsDemuxer(mux_ps(es)).video_stream() == es
    gen2 = Mpeg2StreamGen(64, 48, seed=5)
    es2 = gen2.generate("IPBBPI")
    assert PsDemuxer(mux_ps_aligned(es2)).video_stream() == es2


@pytest.mark.parametrize("seed", range(2))
def test_ps_vs_reference(reference_bins, tmp_path, seed):
    """Reference m2dec decodes our muxed .vob; our demux+decode matches."""
    gen = Mpeg2StreamGen(64, 48, seed=seed)
    es = gen.generate("IPBBP" + "I")
    ps = mux_ps_aligned(es)
    (tmp_path / "in.vob").write_bytes(ps)
    subprocess.run(
        [str(reference_bins["m2dec"]), "-o", "out.raw", "in.vob"],
        cwd=tmp_path, capture_output=True,
    )
    golden = (tmp_path / "out.raw").read_bytes()
    dec = Mpeg2Decoder()
    dec.set_data(PsDemuxer(ps).video_stream())
    ours = b"".join(cropped_nv12_bytes(f) for f in dec.decode_all())
    fs = 64 * 48 * 3 // 2
    assert len(golden) >= 4 * fs
    assert ours[: len(golden)] == golden


def test_cli_m2dec(reference_bins, tmp_path):
    import subprocess as sp
    gen = Mpeg2StreamGen(48, 32, seed=1)
    es = gen.generate("IPI")
    (tmp_path / "in.m2v").write_bytes(es)
    sp.run([sys.executable, "-m", "m2dec_tpu.apps.m2dec",
            "-O", str(tmp_path / "ours.md5"), str(tmp_path / "in.m2v")],
           check=True, capture_output=True,
           cwd=pathlib.Path(__file__).parent.parent)
    golden = oracle_decode(reference_bins, es, tmp_path, md5=True)
    ours = (tmp_path / "ours.md5").read_bytes()
    assert ours[: len(golden)] == golden


# -- field motion in frame pictures (frame_pred_frame_dct=0) ------------
from streamgen.mpeg2_enc import Mpeg2FieldMcGen  # noqa: E402


@pytest.mark.parametrize("seed", range(3))
def test_field_mc_frame_pictures(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path, Mpeg2FieldMcGen(64, 48, seed=seed),
             "IPBBP")


def test_field_mc_jax_backend(reference_bins, tmp_path):
    run_case(reference_bins, tmp_path, Mpeg2FieldMcGen(64, 48, seed=7),
             "IPBBP", backend="jax")


@pytest.mark.parametrize("seed", range(2))
def test_dual_prime_frame_pictures(reference_bins, tmp_path, seed):
    """Dual prime, reference-simplified: dmvectors parsed-and-discarded,
    frame MC with the field-coded MV (mpeg2.cpp:819-825, :1212-1220)."""
    run_case(reference_bins, tmp_path,
             Mpeg2FieldMcGen(64, 48, seed=seed, field_prob=0.3,
                             dual_prob=0.4), "IPPBP")


# -- field pictures (picture_structure 1/2) -----------------------------
from streamgen.mpeg2_enc import Mpeg2FieldPicGen  # noqa: E402


@pytest.mark.parametrize("seed", range(3))
def test_field_pictures_ip(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path,
             Mpeg2FieldPicGen(64, 48, seed=seed), "IIPPPP")


@pytest.mark.parametrize("seed", range(2))
def test_field_pictures_b(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path,
             Mpeg2FieldPicGen(64, 48, seed=10 + seed, field_prob=0.4),
             "IIPPBBPPBB")


def test_field_pictures_dual_prime(reference_bins, tmp_path):
    run_case(reference_bins, tmp_path,
             Mpeg2FieldPicGen(64, 48, seed=5, field_prob=0.3,
                              dual_prob=0.3), "IIPPPP")


@pytest.mark.parametrize("seed", range(2))
def test_motion_type_0_frame_pictures(reference_bins, tmp_path, seed):
    """Reserved motion_type code 0 decodes via the reference table's
    "dummy" row, identically to code 1 (m2d_motion_type[0][0],
    mpeg2.cpp:819-825)."""
    run_case(reference_bins, tmp_path,
             Mpeg2FieldMcGen(64, 48, seed=seed, field_prob=0.5,
                             mt0_prob=0.6), "IPBBP")


def test_motion_type_0_field_pictures(reference_bins, tmp_path):
    """motion_type 0 in field pictures == field MC (m2d_motion_type[1][0],
    mpeg2.cpp:826-831)."""
    run_case(reference_bins, tmp_path,
             Mpeg2FieldPicGen(64, 48, seed=3, field_prob=0.4,
                              mt0_prob=0.6), "IIPPPP")


def test_native_phase_a_covers_field_pictures(reference_bins, tmp_path):
    """The C++ Phase A must handle field pictures (structure 1/2) and
    field-MC-in-frame streams directly — no silent Python fallback
    (frame_mode=0 decode model, m2vparse.cpp decode_mb_mode)."""
    import m2dec_tpu.codecs.mpeg2.decoder as D

    if __import__("m2dec_tpu.native", fromlist=["load_m2v"]).load_m2v() \
            is None:
        pytest.skip("native toolchain unavailable")
    counts = {"python": 0}
    orig = D.Mpeg2EntropyDecoder

    class Counting(orig):
        def __init__(self, *a, **k):
            counts["python"] += 1
            super().__init__(*a, **k)

    D.Mpeg2EntropyDecoder = Counting
    try:
        for gen, pat in ((Mpeg2FieldPicGen(64, 48, seed=1), "IIPPPP"),
                         (Mpeg2FieldMcGen(64, 48, seed=2), "IPPBP")):
            data = gen.generate(pat + "I")
            golden = oracle_decode(reference_bins, data, tmp_path)
            dec = D.Mpeg2Decoder(backend="numpy")
            dec.set_data(data)
            ours = b"".join(cropped_nv12_bytes(f) for f in dec.decode_all())
            assert ours[: len(golden)] == golden and golden
        assert counts["python"] == 0, "native Phase A fell back to Python"
    finally:
        D.Mpeg2EntropyDecoder = orig
