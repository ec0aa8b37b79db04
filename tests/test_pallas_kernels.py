"""Pallas kernel tier: bit-equality with the host-exact IDCT (interpret
mode on CPU; the compiled path runs on real TPU via the bench flag)."""

import numpy as np

from m2dec_tpu.kernels.mpeg2_idct import idct8x8
from m2dec_tpu.kernels.pallas_idct import idct8x8_pallas


def test_pallas_idct_matches_exact():
    rng = np.random.default_rng(0)
    coef = rng.integers(-2048, 2048, (700, 8, 8)).astype(np.int32)
    want = idct8x8(coef, np)
    got = np.asarray(idct8x8_pallas(coef, tile=256, interpret=True))
    assert np.array_equal(want, got)


def test_pallas_idct_int16_wrap_case():
    # drive the horizontal-store int16 wraparound domain explicitly
    coef = np.zeros((4, 8, 8), np.int32)
    coef[:, 0, :] = 2047
    coef[:, 7, :] = -2048
    want = idct8x8(coef, np)
    got = np.asarray(idct8x8_pallas(coef, tile=4, interpret=True))
    assert np.array_equal(want, got)
