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
