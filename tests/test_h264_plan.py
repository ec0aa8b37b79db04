"""PicturePlan roundtrip: Phase-A plan + numpy Phase-B interpreter must
reproduce the interleaved Python decoder's frames exactly.

This validates the Phase-A/Phase-B tensor boundary (codecs/h264/plan.py)
that the JAX reconstruction and the native C++ front end both target.
The oracle is the already-reference-verified Python decoder, so no
reference binary is needed here.
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

from m2dec_tpu.codecs.h264.decoder import Frame, H264Decoder  # noqa: E402
from m2dec_tpu.codecs.h264.recon_ref import reconstruct_plan_np  # noqa: E402
from m2dec_tpu.codecs.h264.reconstruct import reconstruct_plan_jax  # noqa: E402


def roundtrip(gen, pattern):
    """Both Phase-B backends (numpy interpreter, JAX jit graph) must
    reproduce the interleaved decoder's frames exactly."""
    data = gen.generate(pattern)
    dec = H264Decoder(dpb_max=1, record_plans=True)
    dec.set_data(data)
    shadows = None
    npics = 0
    backends = ((reconstruct_plan_np, "np"), (reconstruct_plan_jax, "jax"))
    while dec.decode_picture() == 1:
        if shadows is None:
            h, w = dec.frames[0].y.shape
            shadows = [[Frame(w, h) for _ in dec.frames] for _ in backends]
        plan = dec.plans[-1]
        ref = dec.frames[plan.cur_idx]
        for shadow, (recon, name) in zip(shadows, backends):
            recon(plan, shadow)
            ours = shadow[plan.cur_idx]
            for pl in ("y", "cb", "cr"):
                a, b = getattr(ours, pl), getattr(ref, pl)
                if not np.array_equal(a, b):
                    bad = np.argwhere(a != b)
                    raise AssertionError(
                        f"[{name}] pic {npics} plane {pl}: {len(bad)} "
                        f"mismatches, first at {bad[0]}: "
                        f"{a[tuple(bad[0])]} != {b[tuple(bad[0])]}")
        npics += 1
    assert npics == len(dec.plans) and npics > 0


def test_plan_intra_cavlc():
    roundtrip(H264IntraGen(80, 48, seed=3, qp=28, disable_deblock=False),
              "II")


def test_plan_ipcm():
    roundtrip(H264StreamGen(48, 32, seed=1), "III")


def test_plan_intra_cabac():
    roundtrip(H264CabacIGen(64, 48, seed=7, qp=30, disable_deblock=False),
              "II")


@pytest.mark.parametrize("seed", range(2))
def test_plan_p(seed):
    roundtrip(H264InterGen(48, 32, seed=seed, skip_prob=0.2), "IPPI")


def test_plan_p_multiref():
    roundtrip(H264InterGen(64, 48, seed=5, num_ref_frames=4), "IPPPPI")


@pytest.mark.parametrize("spatial", [0, 1])
def test_plan_b(spatial):
    roundtrip(
        H264BGen(48, 32, seed=spatial, skip_prob=0.25, intra_prob=0.15,
                 num_ref_frames=2, b_direct_prob=0.3,
                 direct_spatial=spatial), "IPBPBB")


def test_plan_b_cif_deblock():
    roundtrip(
        H264BGen(176, 144, seed=11, skip_prob=0.2, intra_prob=0.1,
                 num_ref_frames=4, b_direct_prob=0.3, direct_spatial=1,
                 qp=30), "IPBBPBB")


@pytest.mark.parametrize("seed", range(2))
def test_plan_high(seed):
    roundtrip(H264HighGen(48, 32, seed=seed, intra_prob=0.2,
                          skip_prob=0.15), "IPPI")


def test_plan_high_deblock():
    roundtrip(H264HighGen(80, 48, seed=1, intra_prob=0.15, skip_prob=0.15,
                          qp=29, disable_deblock=False), "IPPI")


def test_plan_weighted_explicit():
    roundtrip(H264WeightedGen(48, 32, seed=0, skip_prob=0.15,
                              intra_prob=0.1, num_ref_frames=2,
                              b_direct_prob=0), "IPP")


@pytest.mark.parametrize("idc", [1, 2])
def test_plan_weighted_b(idc):
    roundtrip(H264WeightedGen(48, 32, seed=idc, skip_prob=0.15,
                              intra_prob=0.1, num_ref_frames=2,
                              b_direct_prob=0.3, bipred_idc=idc), "IPBPB")


@pytest.mark.parametrize("rps", [1, 2])
def test_plan_multi_slice(rps):
    roundtrip(H264MultiSliceGen(64, 48, seed=rps, rows_per_slice=rps,
                                qp=29, disable_deblock=False), "II")


def test_batched_phase_b():
    """BatchedPhaseB (GOP-level scan with device-resident pool) must match
    the per-picture reconstruction exactly."""
    from m2dec_tpu.codecs.h264.reconstruct import BatchedPhaseB

    gen = H264BGen(48, 32, seed=3, skip_prob=0.25, intra_prob=0.15,
                   num_ref_frames=2, b_direct_prob=0.3, direct_spatial=1,
                   qp=30)
    data = gen.generate("IPBPBB")
    dec = H264Decoder(dpb_max=1, record_plans=True)
    dec.set_data(data)
    shadow = None
    expected = []
    while dec.decode_picture() == 1:
        if shadow is None:
            h, w = dec.frames[0].y.shape
            shadow = [Frame(w, h) for _ in dec.frames]
        plan = dec.plans[-1]
        reconstruct_plan_np(plan, shadow)
        f = shadow[plan.cur_idx]
        expected.append((f.y.copy(), f.cb.copy(), f.cr.copy()))
    b = BatchedPhaseB(dec.max_x, dec.max_y, len(dec.frames))
    # two batches to exercise the carried pool
    outs = b.run(dec.plans[:3]) + b.run(dec.plans[3:])
    assert len(outs) == len(expected)
    for k, (got, exp) in enumerate(zip(outs, expected)):
        for pi, pl in enumerate(("y", "cb", "cr")):
            assert np.array_equal(got[pi], exp[pi]), f"pic {k} {pl}"


def test_batched_phase_b_pcm():
    """IPCM pictures through the batched (wire-blob) Phase B: PCM
    samples ship as a dense side-channel and substitute before the
    intra wavefront (kind==4 select), matching the per-picture path."""
    from m2dec_tpu.codecs.h264.reconstruct import (
        BatchedPhaseB,
        MultiStreamPhaseB,
    )

    gen = H264BGen(48, 32, seed=5, skip_prob=0.2, intra_prob=0.3,
                   ipcm_prob=0.5, num_ref_frames=2, b_direct_prob=0.2)
    data = gen.generate("IPBP")
    dec = H264Decoder(dpb_max=1, record_plans=True)
    dec.set_data(data)
    shadow = None
    expected = []
    while dec.decode_picture() == 1:
        if shadow is None:
            h, w = dec.frames[0].y.shape
            shadow = [Frame(w, h) for _ in dec.frames]
        plan = dec.plans[-1]
        reconstruct_plan_np(plan, shadow)
        f = shadow[plan.cur_idx]
        expected.append((f.y.copy(), f.cb.copy(), f.cr.copy()))
    assert any(p.pcm for p in dec.plans), "generator emitted no IPCM"
    b = BatchedPhaseB(dec.max_x, dec.max_y, len(dec.frames))
    outs = b.run(dec.plans[:2]) + b.run(dec.plans[2:])
    for k, (got, exp) in enumerate(zip(outs, expected)):
        for pi, pl in enumerate(("y", "cb", "cr")):
            assert np.array_equal(got[pi], exp[pi]), f"pic {k} {pl}"
    # stacked multi-stream path with the same stream twice
    ms = MultiStreamPhaseB(2, dec.max_x, dec.max_y, len(dec.frames))
    souts = ms.run([dec.plans, dec.plans])
    for s in range(2):
        ys, cbs, crs = (np.asarray(o) for o in souts[s])
        for k, exp in enumerate(expected):
            assert np.array_equal(ys[k], exp[0]), f"s{s} pic {k} y"
            assert np.array_equal(cbs[k], exp[1]), f"s{s} pic {k} cb"
            assert np.array_equal(crs[k], exp[2]), f"s{s} pic {k} cr"
    # native Phase A + C++ wire packer route (pcm rides the
    # side-channel next to the packed blob)
    from m2dec_tpu.native import load_h264

    if load_h264() is not None:
        dn = H264Decoder(dpb_max=1, native=True, plan_alloc="empty")
        dn.set_data(data)
        while dn.decode_picture() == 1:
            pass
        assert all(p.coded is not None for p in dn.plans)
        bn = BatchedPhaseB(dn.max_x, dn.max_y, len(dn.frames))
        nouts = bn.run(dn.plans)
        for k, (got, exp) in enumerate(zip(nouts, expected)):
            for pi, pl in enumerate(("y", "cb", "cr")):
                assert np.array_equal(got[pi], exp[pi]), \
                    f"native pic {k} {pl}"


def test_native_pack_wire():
    """The C++ batch packer (h264pack_measure/fill) must be semantically
    identical to the Python _pack_wire path: unpacking its blob yields
    the exact dense plan tensors, including on empty-alloc plans (whose
    uncoded coefficient memory is uninitialized behind the coded map)
    and across a multi-stream batch with differing content (common
    layout, per-stream palettes)."""
    from m2dec_tpu.native import load_h264

    if load_h264() is None:
        pytest.skip("native toolchain unavailable")
    import jax.numpy as jnp

    from m2dec_tpu.codecs.h264 import reconstruct as R
    from m2dec_tpu.codecs.h264.native_pack import pack_batches

    gens = [
        (H264BGen(48, 32, seed=3, skip_prob=0.25, intra_prob=0.15,
                  num_ref_frames=2, b_direct_prob=0.3, direct_spatial=1,
                  qp=30), "IPBPBB"),
        (H264HighGen(48, 32, seed=9, skip_prob=0.15, intra_prob=0.2,
                     qp=24, disable_deblock=False), "IPPIPP"),
    ]
    datas = [g.generate(pat) for g, pat in gens]
    truth = []
    fast = []
    for data in datas:
        d0 = H264Decoder(dpb_max=1, native=True)
        d0.set_data(data)
        while d0.decode_picture() == 1:
            pass
        truth.append({k: np.stack([getattr(p, k) for p in d0.plans])
                      for k in R._PLAN_KEYS})
        d1 = H264Decoder(dpb_max=1, native=True, plan_alloc="empty")
        d1.set_data(data)
        while d1.decode_picture() == 1:
            pass
        fast.append(d1.plans)
    res = pack_batches(fast)
    assert res is not None
    blobs, layout, pals_list, has_i8, deblock = res
    assert has_i8 and deblock
    for si in range(len(datas)):
        wire = R._wire_views(blobs[si], layout)
        dense = R._unpack_wire(
            {k: (dict(v) if isinstance(v, dict) else v)
             for k, v in wire.items()}, jnp, pals_list[si])
        for k in R._PLAN_KEYS:
            a = np.asarray(dense[k]).astype(np.int64)
            b = truth[si][k].astype(np.int64)
            assert a.shape == b.shape, f"stream {si} {k} shape"
            assert np.array_equal(a, b), f"stream {si} {k} values"


def test_multistream_phase_b_mixed():
    """MultiStreamPhaseB with DIFFERENT streams per lane (native pack
    unifies the layout; palettes ship per-stream, stacked)."""
    from m2dec_tpu.native import load_h264

    if load_h264() is None:
        pytest.skip("native toolchain unavailable")
    from m2dec_tpu.codecs.h264.reconstruct import MultiStreamPhaseB

    gens = [
        H264BGen(48, 32, seed=5, skip_prob=0.3, intra_prob=0.2,
                 num_ref_frames=2, qp=28),
        H264BGen(48, 32, seed=21, skip_prob=0.1, intra_prob=0.05,
                 num_ref_frames=2, b_direct_prob=0.4, direct_spatial=1,
                 qp=33),
    ]
    datas = [g.generate("IPPBPB") for g in gens]
    expected = []  # per stream: list of (y, cb, cr)
    plans_per_stream = []
    pool_size = mbw = mbh = None
    for data in datas:
        dec = H264Decoder(dpb_max=1, record_plans=True)
        dec.set_data(data)
        shadow = None
        exp = []
        while dec.decode_picture() == 1:
            if shadow is None:
                h, w = dec.frames[0].y.shape
                shadow = [Frame(w, h) for _ in dec.frames]
            plan = dec.plans[-1]
            reconstruct_plan_np(plan, shadow)
            f = shadow[plan.cur_idx]
            exp.append((f.y.copy(), f.cb.copy(), f.cr.copy()))
        expected.append(exp)
        dn = H264Decoder(dpb_max=1, native=True, plan_alloc="empty")
        dn.set_data(data)
        while dn.decode_picture() == 1:
            pass
        plans_per_stream.append(dn.plans)
        pool_size, mbw, mbh = len(dn.frames), dn.max_x, dn.max_y
    ms = MultiStreamPhaseB(len(datas), mbw, mbh, pool_size)
    outs = ms.run(plans_per_stream)  # list of per-stream (y, cb, cr)
    for si, exp in enumerate(expected):
        ys, cbs, crs = (np.asarray(o) for o in outs[si])
        for k, (ey, ecb, ecr) in enumerate(exp):
            assert np.array_equal(ys[k], ey), f"s{si} pic{k} y"
            assert np.array_equal(cbs[k], ecb), f"s{si} pic{k} cb"
            assert np.array_equal(crs[k], ecr), f"s{si} pic{k} cr"
