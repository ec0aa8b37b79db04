"""Native C++ H.264 Phase A vs the Python Phase A: plan tensors must be
identical field-for-field on every picture.

The Python plans are themselves roundtrip-verified against the decoder
frames (test_h264_plan.py) which are oracle-verified against the
reference binary (test_h264_decode.py), so plan equality here proves
the native front end bit-exact end-to-end.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from streamgen.h264_enc import (  # noqa: E402
    H264BGen,
    H264CabacIGen,
    H264HighGen,
    H264IntraGen,
    H264InterGen,
    H264MultiSliceGen,
    H264StreamGen,
    H264WeightedGen,
)

from m2dec_tpu.codecs.h264.decoder import H264Decoder  # noqa: E402
from m2dec_tpu.native import load_h264  # noqa: E402

pytestmark = pytest.mark.skipif(load_h264() is None,
                                reason="native toolchain unavailable")

_FIELDS = ("kind", "t8x8", "coef_luma", "coef_chroma", "i4_modes",
           "i4_avail", "i8_modes", "i8_avail", "i16_mode", "chroma_mode",
           "mb_avail", "mv", "slot", "wp", "deb_str", "deb_str4", "deb_ab")


def compare_plans(p1, p2, pic):
    for f in _FIELDS:
        a, b = getattr(p1, f), getattr(p2, f)
        if not np.array_equal(a, b):
            bad = np.argwhere(a != b)
            raise AssertionError(
                f"pic {pic} field {f}: {len(bad)} mismatches, first at "
                f"{bad[0]}: py={a[tuple(bad[0])]} native={b[tuple(bad[0])]}")
    assert sorted(p1.pcm) == sorted(p2.pcm), f"pic {pic} pcm mbs differ"
    for k in p1.pcm:
        for x, y in zip(p1.pcm[k], p2.pcm[k]):
            assert np.array_equal(x, y), f"pic {pic} pcm mb {k}"


def plan_diff(gen, pattern):
    data = gen.generate(pattern)
    d1 = H264Decoder(dpb_max=1, record_plans=True)
    d1.set_data(data)
    d2 = H264Decoder(dpb_max=1, native=True)
    d2.set_data(data)
    pic = 0
    while True:
        e1 = d1.decode_picture()
        e2 = d2.decode_picture()
        assert e1 == e2
        if e1 != 1:
            break
        compare_plans(d1.plans[-1], d2.plans[-1], pic)
        pic += 1
    assert pic > 0


@pytest.mark.parametrize("seed", range(3))
def test_native_intra_cavlc(seed):
    plan_diff(H264IntraGen(80, 48, seed=seed, qp=28,
                           disable_deblock=False), "III")


def test_native_intra_qp_range():
    plan_diff(H264IntraGen(64, 48, seed=8, qp=44, chroma_qp_index=12,
                           disable_deblock=False), "II")


def test_native_ipcm():
    plan_diff(H264StreamGen(48, 32, seed=1), "III")


def test_native_multi_slice():
    plan_diff(H264MultiSliceGen(64, 48, seed=2, rows_per_slice=2, qp=29,
                                disable_deblock=False), "II")


@pytest.mark.parametrize("seed", range(3))
def test_native_p(seed):
    plan_diff(H264InterGen(48, 32, seed=seed, skip_prob=0.2), "IPPI")


def test_native_p_multiref():
    plan_diff(H264InterGen(64, 48, seed=5, num_ref_frames=4), "IPPPPI")


@pytest.mark.parametrize("spatial", [0, 1])
def test_native_b(spatial):
    plan_diff(
        H264BGen(48, 32, seed=spatial, skip_prob=0.25, intra_prob=0.15,
                 num_ref_frames=2, b_direct_prob=0.3,
                 direct_spatial=spatial), "IPBPBB")


def test_native_b_cif():
    plan_diff(
        H264BGen(176, 144, seed=11, skip_prob=0.2, intra_prob=0.1,
                 num_ref_frames=4, b_direct_prob=0.3, direct_spatial=1,
                 qp=30), "IPBBPBB")


@pytest.mark.parametrize("seed", range(2))
def test_native_high_cavlc(seed):
    plan_diff(H264HighGen(48, 32, seed=seed, intra_prob=0.2,
                          skip_prob=0.15), "IPPI")


def test_native_weighted_explicit():
    plan_diff(H264WeightedGen(48, 32, seed=0, skip_prob=0.15,
                              intra_prob=0.1, num_ref_frames=2,
                              b_direct_prob=0), "IPP")


@pytest.mark.parametrize("idc", [1, 2])
def test_native_weighted_b(idc):
    plan_diff(H264WeightedGen(48, 32, seed=idc, skip_prob=0.15,
                              intra_prob=0.1, num_ref_frames=2,
                              b_direct_prob=0.3, bipred_idc=idc), "IPBPB")


# -- CABAC ---------------------------------------------------------------
import random  # noqa: E402

from streamgen.h264_transcode import transcode_to_cabac  # noqa: E402


def test_native_cabac_intra():
    plan_diff(H264CabacIGen(64, 48, seed=7, qp=30, disable_deblock=False),
              "II")


def plan_diff_cabac(gen, pattern, seed=0):
    cavlc = gen.generate(pattern)
    data = transcode_to_cabac(cavlc, random.Random(seed))

    class _Pre:
        def generate(self, _):
            return data

    plan_diff(_Pre(), pattern)


@pytest.mark.parametrize("seed", range(2))
def test_native_cabac_p(seed):
    plan_diff_cabac(H264InterGen(48, 32, seed=seed, skip_prob=0.2), "IPPI")


@pytest.mark.parametrize("spatial", [0, 1])
def test_native_cabac_b(spatial):
    plan_diff_cabac(
        H264BGen(48, 32, seed=spatial, skip_prob=0.25, intra_prob=0.15,
                 num_ref_frames=2, b_direct_prob=0.3,
                 direct_spatial=spatial), "IPBPBB")


def test_native_cabac_b_cif():
    plan_diff_cabac(
        H264BGen(176, 144, seed=11, skip_prob=0.2, intra_prob=0.1,
                 num_ref_frames=4, b_direct_prob=0.3, direct_spatial=1,
                 qp=30), "IPBBPBB")


@pytest.mark.parametrize("seed", range(2))
def test_native_cabac_high(seed):
    plan_diff_cabac(H264HighGen(48, 32, seed=seed, intra_prob=0.2,
                                skip_prob=0.15), "IPPI", seed=seed)


# -- deblock-enabled inter coverage (strengths survive finalize only
#    when the in-loop filter is on, so these exercise the recorded maps)
@pytest.mark.parametrize("seed", range(2))
def test_native_b_deblock(seed):
    plan_diff(
        H264BGen(80, 64, seed=42 + seed, num_ref_frames=2,
                 b_direct_prob=0.3, skip_prob=0.35, intra_prob=0.08,
                 qp=30, disable_deblock=False), "IPBPBP")


def test_native_p_deblock():
    plan_diff(H264InterGen(80, 48, seed=3, skip_prob=0.2, qp=29,
                           disable_deblock=False), "IPPP")


def test_native_high_deblock():
    plan_diff(H264HighGen(80, 48, seed=1, intra_prob=0.15, skip_prob=0.15,
                          qp=29, disable_deblock=False), "IPPI")


def test_native_cabac_b_deblock():
    plan_diff_cabac(
        H264BGen(80, 64, seed=42, num_ref_frames=2, b_direct_prob=0.3,
                 skip_prob=0.35, intra_prob=0.08, qp=30,
                 disable_deblock=False), "IPBPBP")


# -- field_pic_flag (CABAC field significance contexts) -------------------
def test_native_field_cabac():
    class _FieldCabacIGen(H264CabacIGen):
        field_pics = True

    plan_diff(_FieldCabacIGen(64, 48, seed=7, qp=30,
                              disable_deblock=False), "II")


def test_native_field_b():
    class _FieldBGen(H264BGen):
        field_pics = True

    plan_diff(_FieldBGen(48, 32, seed=1, skip_prob=0.25, intra_prob=0.15,
                         num_ref_frames=2, b_direct_prob=0.3,
                         direct_spatial=1), "IPBPB")


def test_native_slice_parallel_large(reference_bins, tmp_path):
    """Wavefront-parallel Phase A: a many-slice picture decodes its
    non-final slices on worker threads (worker contexts share the plan
    buffers; the final slice joins and runs synchronously). Must be
    byte-exact with the reference binary and with the sequential
    session (M2DEC_TPU_SLICE_THREADS=0)."""
    import os
    import subprocess

    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.runtime.output import cropped_nv12_bytes

    gen = H264MultiSliceGen(128, 96, seed=31, rows_per_slice=1, qp=26)
    data = gen.generate("III")
    src = tmp_path / "in.264"
    src.write_bytes(data)
    subprocess.run([str(reference_bins["h264dec"]), "-o", "in.264"],
                   cwd=tmp_path, capture_output=True)
    golden = (tmp_path / "in.out").read_bytes()
    assert golden

    def run():
        dec = H264Decoder(native=True, phase_b="np")
        dec.set_data(data)
        return b"".join(cropped_nv12_bytes(f) for f in dec.decode_all())

    par = run()
    assert par[: len(golden)] == golden
    os.environ["M2DEC_TPU_SLICE_THREADS"] = "0"
    try:
        seq = run()
    finally:
        del os.environ["M2DEC_TPU_SLICE_THREADS"]
    assert seq == par


@pytest.mark.parametrize("cabac", [False, True])
def test_native_truncation_abandons_picture(cabac):
    """Mid-slice truncation must abandon the picture in the native
    Phase A exactly like the Python decoder (the reference's refill
    longjmp, bitio.c:112-128): same frame count, same pixels, -2 from
    decode_picture — never a garbage picture completed from the
    BitReader's zero-padded tail."""
    from m2dec_tpu.runtime.output import cropped_nv12_bytes

    gen = H264BGen(48, 32, seed=2, skip_prob=0.2, intra_prob=0.15,
                   num_ref_frames=2, b_direct_prob=0.3)
    data = gen.generate("IPBBP")
    if cabac:
        from streamgen.h264_transcode import transcode_to_cabac

        data = transcode_to_cabac(data, random.Random(7))
    for frac in (3, 2):
        cut = data[: len(data) * frac // 4]
        dp = H264Decoder()
        dp.set_data(cut)
        exp = dp.decode_all()
        dn = H264Decoder(native=True, phase_b="np")
        dn.set_data(cut)
        got = dn.decode_all()
        assert len(got) == len(exp)
        assert b"".join(cropped_nv12_bytes(f) for f in got) == \
            b"".join(cropped_nv12_bytes(f) for f in exp)
