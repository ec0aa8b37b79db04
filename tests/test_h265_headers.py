"""H.265 parameter-set parsing round-trip (scaffolding phase)."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from m2dec_tpu.bitstream import BitWriter  # noqa: E402
from m2dec_tpu.bitstream.writer import escape_nal  # noqa: E402
from m2dec_tpu.codecs.h265.headers import H265Decoder  # noqa: E402


def _nal(out, nal_type, payload_writer):
    w = BitWriter()
    payload_writer(w)
    w.rbsp_trailing_bits()
    out += b"\x00\x00\x01"
    out += bytes([(nal_type << 1), 1])  # nal header: type + tid+1
    out += escape_nal(w.tobytes())


def _ptl(w):
    w.put_bits(0x01, 8)
    w.put_bits(0x60000000, 32)
    for _ in range(6):
        w.put_bits(0, 8)
    w.put_bits(93, 8)  # level 3.1


def _vps(w):
    w.put_bits(0, 4)
    w.put_bits(3, 2)
    w.put_bits(0, 6)
    w.put_bits(0, 3)  # max_sub_layers_minus1
    w.put_bits(1, 1)
    w.put_bits(0xFFFF, 16)
    _ptl(w)
    w.put_bits(1, 1)  # ordering info present
    w.ue(3)
    w.ue(2)
    w.ue(0)
    w.put_bits(0, 6)
    w.ue(0)  # num_layer_sets_minus1
    w.put_bits(0, 1)  # timing info


def _sps(w):
    w.put_bits(0, 4)
    w.put_bits(0, 3)
    w.put_bits(1, 1)
    _ptl(w)
    w.ue(0)  # sps id
    w.ue(1)  # chroma 4:2:0
    w.ue(352)
    w.ue(288)
    w.put_bits(1, 1)  # conformance window
    for v in (0, 0, 0, 8):
        w.ue(v)
    w.ue(0)
    w.ue(0)
    w.ue(4)  # log2_max_poc_lsb-4
    w.put_bits(1, 1)
    w.ue(4)
    w.ue(2)
    w.ue(0)
    w.ue(0)  # log2_min_cb-3
    w.ue(3)  # ctb delta -> 64
    w.ue(0)
    w.ue(3)
    w.ue(0)
    w.ue(0)
    w.put_bits(0, 1)  # scaling lists
    w.put_bits(1, 1)  # amp
    w.put_bits(1, 1)  # sao
    w.put_bits(0, 1)  # pcm
    w.ue(2)  # two short-term RPS
    # rps0 nopred: 2 neg, 0 pos
    w.ue(2)
    w.ue(0)
    w.ue(0)  # delta 1
    w.put_bits(1, 1)
    w.ue(1)  # delta 2 -> -3
    w.put_bits(1, 1)
    # rps1: predicted from rps0: delta_rps = -1, keep both + the ref
    w.put_bits(1, 1)  # pred flag
    w.put_bits(1, 1)  # sign (negative)
    w.ue(0)  # abs-1 -> delta_rps = -1
    for _ in range(3):  # used flags for 2 entries + delta_rps itself
        w.put_bits(1, 1)
    w.put_bits(0, 1)  # long term
    w.put_bits(1, 1)  # temporal mvp
    w.put_bits(1, 1)  # strong intra smoothing


def _pps(w):
    w.ue(0)
    w.ue(0)
    w.put_bits(0, 1)
    w.put_bits(0, 1)
    w.put_bits(0, 3)
    w.put_bits(1, 1)  # sign data hiding
    w.put_bits(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(2)  # init_qp 28 (reference reads ue — quirk)
    w.put_bits(0, 1)
    w.put_bits(1, 1)  # transform skip
    w.put_bits(0, 1)
    w.se(1)
    w.se(-1)
    w.put_bits(0, 1)
    w.put_bits(0, 1)
    w.put_bits(0, 1)
    w.put_bits(0, 1)
    w.put_bits(0, 1)  # tiles
    w.put_bits(0, 1)  # wpp
    w.put_bits(1, 1)
    w.put_bits(0, 1)
    w.put_bits(0, 1)  # scaling list
    w.put_bits(0, 1)
    w.ue(0)


def test_h265_header_roundtrip():
    out = bytearray()
    _nal(out, 32, _vps)
    _nal(out, 33, _sps)
    _nal(out, 34, _pps)
    dec = H265Decoder()
    dec.set_data(bytes(out))
    seen = dec.parse_headers()
    assert seen == [32, 33, 34]
    sps = dec.sps_store[0]
    assert (sps.pic_width, sps.pic_height) == (352, 288)
    assert sps.cropping == (0, 0, 0, 8)
    assert sps.log2_ctb == 6
    assert sps.sao_enabled == 1
    r0, r1 = sps.short_term_rps
    assert r0.neg == (-1, -3) and r0.total_curr == 2
    # predicted RPS derivation order (h265.cpp:452-460): opposite-sign
    # refs first, then delta_rps itself, then same-sign refs shifted
    assert r1.neg == (-1, -2, -4) and r1.total_curr == 3
    pps = dec.pps_store[0]
    assert pps.init_qp == 28 and pps.sign_data_hiding == 1
    assert (pps.cb_qp_offset, pps.cr_qp_offset) == (1, -1)
    # headers-only stream: CTU decode (now implemented) has no slices
    # to decode
    assert dec.decode_all() == []
