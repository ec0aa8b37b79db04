"""Bitstream substrate tests.

Mirrors the reference's embedded bit-reader tests: randomized equivalence of
show+skip vs get (reference: src/app/m2dec.cpp:77-113 `test_dec_bits`), plus
writer<->reader round-trips and emulation-prevention escape/unescape.
"""

import random

import numpy as np
import pytest

from m2dec_tpu.bitstream import (
    BitReader,
    BitWriter,
    BitstreamExhausted,
    unescape_nal,
)
from m2dec_tpu.bitstream.reader import find_start_codes
from m2dec_tpu.bitstream.writer import escape_nal


def test_show_get_equivalence_randomized():
    rng = random.Random(1234)
    data = bytes(rng.randrange(256) for _ in range(4096))
    a, b = BitReader(data), BitReader(data)
    total = 8 * len(data)
    while a.bitpos < total - 32:
        n = rng.randrange(1, 25)
        assert a.show_bits(n) == b.show_bits(n)
        va = a.get_bits(n)
        vb = b.show_bits(n)
        b.skip_bits(n)
        assert va == vb
        assert a.bitpos == b.bitpos


def test_get_bits_values():
    r = BitReader(bytes([0b10110011, 0b01000001]))
    assert r.get_bits(1) == 1
    assert r.get_bits(3) == 0b011
    assert r.get_bits(4) == 0b0011
    assert r.show_bits(8) == 0b01000001
    assert r.get_bits(8) == 0b01000001
    with pytest.raises(BitstreamExhausted):
        r.get_bits(1)


def test_byte_align_and_skip_bytes():
    r = BitReader(bytes(range(16)))
    r.get_bits(3)
    r.byte_align()
    assert r.bitpos == 8
    r.skip_bytes(2)
    assert r.get_bits(8) == 3
    r.get_bits(4)
    r.skip_bytes(1)  # aligns first (reference bitio.c:223-241 semantics)
    assert r.get_bits(8) == 6


def test_golomb_roundtrip():
    values = list(range(0, 200)) + [254, 255, 256, 1000, 65534, 65535]
    w = BitWriter()
    for v in values:
        w.ue(v)
    svalues = [0, 1, -1, 2, -2, 17, -17, 255, -255, 32767, -32768]
    for v in svalues:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.tobytes())
    for v in values:
        assert r.ue() == v
    for v in svalues:
        assert r.se() == v


def test_more_rbsp_data():
    w = BitWriter()
    w.ue(5)
    w.rbsp_trailing_bits()
    r = BitReader(w.tobytes())
    assert r.more_rbsp_data()
    assert r.ue() == 5
    assert not r.more_rbsp_data()


def test_escape_unescape_roundtrip():
    rng = random.Random(7)
    for _ in range(50):
        # biased toward zeros to hit emulation patterns often
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 0x47, 0xFF]) for _ in range(rng.randrange(0, 400)))
        esc = escape_nal(raw)
        assert unescape_nal(esc) == raw
        # escaped stream must not contain 00 00 0x for x<3 (00 00 03 is the
        # emulation prevention byte itself and is legal)
        for i in range(len(esc) - 2):
            if esc[i] == 0 and esc[i + 1] == 0:
                assert esc[i + 2] >= 3


def test_unescape_consecutive():
    assert unescape_nal(bytes([0, 0, 3, 0, 0, 3, 1])) == bytes([0, 0, 0, 0, 1])
    assert unescape_nal(bytes([0, 0, 3])) == bytes([0, 0])
    assert unescape_nal(bytes([1, 0, 0, 3, 2])) == bytes([1, 0, 0, 2])


def test_find_start_codes():
    data = bytes([0, 0, 1, 0xB3, 5, 6, 0, 0, 0, 1, 0x00, 9, 0, 0, 1])
    got = find_start_codes(data)
    # a prefix at the very end of the buffer is reported too (its NAL is
    # empty, but the previous NAL must not absorb the 00 00 01 — header
    # spans replayed by the -f CLI path end in a bare start code)
    np.testing.assert_array_equal(got, [0, 7, 12])
    assert find_start_codes(b"").size == 0
