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


def _wf_rand_plan(mb_w, mb_h, seed):
    import numpy as np

    n = mb_w * mb_h
    rng = np.random.default_rng(seed)
    return {
        "kind": rng.integers(0, 4, n).astype(np.int32),
        "res_y": rng.integers(-20, 20, (n, 16, 16)).astype(np.int32),
        "res_c": rng.integers(-20, 20, (n, 2, 8, 8)).astype(np.int32),
        "i4_modes": rng.integers(0, 9, (n, 16)).astype(np.int32),
        "i4_avail": np.full((n, 16), 7, np.int32),
        "i8_modes": rng.integers(0, 9, (n, 4)).astype(np.int32),
        "i8_avail": np.full((n, 4), 15, np.int32),
        "i16_mode": rng.integers(0, 4, n).astype(np.int32),
        "chroma_mode": rng.integers(0, 4, n).astype(np.int32),
        "mb_avail": np.full(n, 3, np.int32),
        "deb_str": rng.integers(0, 256, (n, 2, 4)).astype(np.int32),
        "deb_str4": rng.integers(0, 2, (n, 2)).astype(np.int32),
        "deb_ab": rng.integers(20, 40, (n, 2, 6, 2)).astype(np.int32),
    }


def test_pallas_wavefront_kernels_vs_xla_scan():
    """The four Pallas sequential-grid wavefront kernels (interpret
    mode) must match the XLA skewed-scan path exactly on random planes
    + random plan metadata (incl. 8x8 intra and active deblock)."""
    import numpy as np
    import jax.numpy as jnp

    import m2dec_tpu.codecs.h264.pallas_wavefront as PW
    import m2dec_tpu.codecs.h264.wavefront as WF
    from m2dec_tpu.codecs.h264 import tables as T

    mb_w, mb_h = 4, 2
    g = WF.get_geom(mb_w, mb_h)
    rng = np.random.default_rng(3)
    P = _wf_rand_plan(mb_w, mb_h, 3)
    y = rng.integers(0, 256, (mb_h * 16, mb_w * 16)).astype(np.int32)
    cb = rng.integers(0, 256, (mb_h * 8, mb_w * 8)).astype(np.int32)
    cr = rng.integers(0, 256, (mb_h * 8, mb_w * 8)).astype(np.int32)

    Pd = WF.diag_gather(P, g, True, True, jnp, full=True)
    oy, ocb, ocr = PW.run_wavefronts(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), Pd, g, True,
        True, mb_w, mb_h, jnp, interpret=True)

    Pd2 = WF.diag_gather(P, g, True, True, jnp)
    tabs = (jnp.asarray(np.asarray(T.DEBLOCK_ALPHA, np.int32)),
            jnp.asarray(np.asarray(T.DEBLOCK_BETA, np.int32)),
            jnp.asarray(np.asarray(T.DEBLOCK_TC0, np.int32)))
    sky = WF.skew_luma(jnp.asarray(y), g, jnp)
    skb = WF.skew_chroma(jnp.asarray(cb), g, jnp)
    skr = WF.skew_chroma(jnp.asarray(cr), g, jnp)
    ik = {k: Pd2[k] for k in WF._INTRA_KEYS + WF._I8_KEYS}
    sky, skb, skr = WF.intra_scan(sky, skb, skr, ik, g, True, jnp)
    dk = {k: Pd2[k] for k in WF._DEB_KEYS}
    sky, skb, skr = WF.deblock_scan(sky, skb, skr, dk, g, jnp, tabs)
    ry = WF.unskew_luma(sky, g, jnp)
    rcb = WF.unskew_chroma(skb, g, jnp)
    rcr = WF.unskew_chroma(skr, g, jnp)
    assert (np.asarray(oy) == np.asarray(ry)).all()
    assert (np.asarray(ocb) == np.asarray(rcb)).all()
    assert (np.asarray(ocr) == np.asarray(rcr)).all()
