"""Multi-chip sharding: the pjit decode step on the virtual 8-device CPU
mesh must be numerically identical to the single-device batched path, and
its outputs must carry the frame-axis sharding."""

import numpy as np

import jax

from m2dec_tpu.parallel.mesh import (
    batched_reconstruct,
    example_batch,
    make_mesh,
    sharded_decode_step,
)


def test_sharded_decode_matches_single_device():
    n, mb_w, mb_h = 8, 4, 3
    args = example_batch(n, mb_w, mb_h, seed=3)
    single = batched_reconstruct(mb_w, mb_h)(*args)
    mesh = make_mesh(8)
    step = sharded_decode_step(mesh, mb_w, mb_h)
    sharded = step(*args)
    for a, b in zip(single, sharded):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    shard_spec = sharded[0].sharding.spec
    assert tuple(shard_spec) and tuple(shard_spec)[0] == "frame"


def test_h265_gop_step_sharded():
    """The H.265 GOP-parallel step (full Phase-B graph per shard) runs
    on the 8-device mesh, outputs carry the frame-axis sharding, and
    every shard's pictures match an independent single-shard run."""
    from m2dec_tpu.parallel.mesh import h265_example_gops, h265_gop_step

    H = W = 32
    pools, xs = h265_example_gops(4, 2, H, W, ctb_log2=4, seed=7)
    mesh = make_mesh(4)
    step = h265_gop_step(mesh, H, W, 4)
    pool, outs = step(pools[0], pools[1], pools[2], xs)
    assert np.asarray(outs[0]).shape == (4, 2, H, W)
    spec = outs[0].sharding.spec
    assert tuple(spec) and tuple(spec)[0] == "frame"
    # cross-check one shard against the unsharded sequence runner
    from m2dec_tpu.codecs.h265.reconstruct import _recon_seq

    g = 2
    xs_g = {k: v[g] for k, v in xs.items()}
    _, ref = _recon_seq(pools[0][g], pools[1][g], pools[2][g], xs_g,
                        H=H, W=W, strong_en=False, has_sao=True,
                        deblock=True, ctb_log2=4, pic_w=W, pic_h=H)
    for a, b in zip(ref, outs):
        assert np.array_equal(np.asarray(a), np.asarray(b)[g])


def test_h264_tile_step_bit_exact():
    """Level-2 spatial tile parallelism: one picture banded over the
    8-device mesh with intra/deblock halo exchange must equal the
    trusted host reconstruction on a REAL stream (intra MBs inside P
    pictures exercise the cross-band top-neighbor line; deblocking
    exercises the 4-row boundary halo + write-back)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from streamgen.h264_enc import H264InterGen

    from m2dec_tpu.codecs.h264.decoder import Frame, H264Decoder
    from m2dec_tpu.codecs.h264.recon_ref import reconstruct_plan_np
    from m2dec_tpu.parallel.mesh import h264_tile_plan, h264_tile_step

    data = H264InterGen(48, 128, seed=3, intra_prob=0.35,
                        num_ref_frames=2,
                        disable_deblock=False).generate("IPPP")
    dec = H264Decoder(record_plans=True)
    dec.set_data(data)
    mesh = make_mesh(8)
    step = None
    shadow = None
    npic = 0
    while dec.decode_picture() == 1:
        if shadow is None:
            h, w = dec.frames[0].y.shape
            shadow = [Frame(w, h) for _ in dec.frames]
        plan = dec.plans[-1]
        refs_y = np.stack([f.y for f in shadow])
        refs_cb = np.stack([f.cb for f in shadow])
        refs_cr = np.stack([f.cr for f in shadow])
        if step is None:
            step = h264_tile_step(mesh, plan.mb_w, plan.mb_h)
        tiled = h264_tile_plan(plan, 8)
        y, cb, cr = step(tiled, refs_y, refs_cb, refs_cr)
        reconstruct_plan_np(plan, shadow)  # trusted host recon
        f = shadow[plan.cur_idx]
        assert np.array_equal(np.asarray(y), f.y), f"pic {npic} luma"
        assert np.array_equal(np.asarray(cb), f.cb), f"pic {npic} cb"
        assert np.array_equal(np.asarray(cr), f.cr), f"pic {npic} cr"
        # band sharding actually applied
        spec = tuple(y.sharding.spec)
        assert spec and spec[0] == "frame"
        npic += 1
    assert npic == 4
