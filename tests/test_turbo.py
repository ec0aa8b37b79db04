"""Overlapped two-phase driver (runtime/turbo.py): output frames,
order, and error containment must be bit-identical to the serial
decoder's decode_all pull loop (m2decoder.h:132-157 semantics)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from streamgen.h264_enc import (  # noqa: E402
    H264BGen,
    H264HighGen,
    H264MmcoGen,
)

from m2dec_tpu.codecs.h264.decoder import H264Decoder  # noqa: E402
from m2dec_tpu.native import load_h264  # noqa: E402
from m2dec_tpu.runtime.turbo import TurboH264Decoder  # noqa: E402

pytestmark = pytest.mark.skipif(load_h264() is None,
                                reason="native toolchain unavailable")


def serial_frames(data):
    dec = H264Decoder()
    dec.set_data(data)
    return dec.decode_all()


def assert_equiv(data, batch):
    exp = serial_frames(data)
    got = TurboH264Decoder(data, batch=batch).decode_all()
    assert len(got) == len(exp)
    for k, (g, e) in enumerate(zip(got, exp)):
        assert g.cnt == e.cnt, f"frame {k} poc"
        assert g.crop == e.crop
        assert np.array_equal(g.y, e.y), f"frame {k} y"
        assert np.array_equal(g.cb, e.cb), f"frame {k} cb"
        assert np.array_equal(g.cr, e.cr), f"frame {k} cr"


@pytest.mark.parametrize("batch", [1, 3, 12])
def test_b_reordered_stream(batch):
    gen = H264BGen(48, 32, seed=2, skip_prob=0.2, intra_prob=0.15,
                   num_ref_frames=2, b_direct_prob=0.3, qp=30,
                   disable_deblock=False)
    assert_equiv(gen.generate("IPBBPBBPB"), batch)


def test_multi_gop_idr():
    gen = H264HighGen(48, 32, seed=4, skip_prob=0.25, intra_prob=0.15,
                      qp=27, disable_deblock=False)
    assert_equiv(gen.generate("IPPIPP"), 4)


def test_mmco_stream():
    gen = H264MmcoGen(48, 32, seed=1, skip_prob=0.2, intra_prob=0.15)
    assert_equiv(gen.generate("IPPPPP"), 4)


def test_pcm_stream():
    gen = H264BGen(48, 32, seed=5, skip_prob=0.2, intra_prob=0.3,
                   ipcm_prob=0.5, num_ref_frames=2, b_direct_prob=0.2)
    assert_equiv(gen.generate("IPBP"), 3)


def test_truncated_stream_drains():
    gen = H264BGen(48, 32, seed=2, skip_prob=0.2, intra_prob=0.15,
                   num_ref_frames=2, b_direct_prob=0.3)
    data = gen.generate("IPBBP")
    cut = data[: len(data) * 3 // 4]
    exp = serial_frames(cut)
    t = TurboH264Decoder(cut, batch=4)
    got = t.decode_all()
    assert t.error < 0
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert np.array_equal(g.y, e.y)


def test_pipeline_two_phase():
    from m2dec_tpu.runtime.pipeline import Pipeline

    gen = H264BGen(48, 32, seed=7, skip_prob=0.2, intra_prob=0.15,
                   num_ref_frames=2, b_direct_prob=0.3)
    data = gen.generate("IPBBPBB")
    exp = serial_frames(data)
    got = []
    n = Pipeline(data, two_phase=True).run(got.append)
    assert n == len(exp)
    for g, e in zip(got, exp):
        assert np.array_equal(g.y, e.y)
        assert np.array_equal(g.cb, e.cb)
        assert np.array_equal(g.cr, e.cr)
