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
