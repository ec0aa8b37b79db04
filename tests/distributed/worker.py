"""2-process jax.distributed worker: multi-host GOP decode with
cross-process DPB page exchange over a collective (SURVEY §5.8).

Each process contributes one CPU device to a 2-device global mesh and
owns one GOP shard; shard 1's picture predicts from shard 0's handoff
frame, which crosses the process boundary inside h264_gop_xchg_step's
ppermute. Both processes verify their local output shard.
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# scrub the test harness's virtual-device flag: each process must
# contribute exactly ONE local CPU device to the 2-device global mesh
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f)

proc_id = int(sys.argv[1])
port = sys.argv[2]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cross-process CPU collectives need an explicit implementation
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2
assert len(jax.devices()) == 2

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from m2dec_tpu.codecs.h264.plan import PicturePlan  # noqa: E402
from m2dec_tpu.codecs.h264.reconstruct import _PLAN_KEYS  # noqa: E402
from m2dec_tpu.parallel.mesh import h264_gop_xchg_step  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

n_shards, pool_size = 2, 2
mb_w, mb_h = 2, 2
H, W = mb_h * 16, mb_w * 16
rng = np.random.default_rng(11)  # same seed on both processes

pools_y = rng.integers(0, 256, (n_shards, pool_size, H, W)).astype(np.uint8)
pools_cb = rng.integers(0, 256, (n_shards, pool_size, H >> 1, W >> 1)).astype(np.uint8)
pools_cr = rng.integers(0, 256, (n_shards, pool_size, H >> 1, W >> 1)).astype(np.uint8)

p = PicturePlan(mb_w, mb_h)
p.kind[:] = 0
p.slot[:, :, 0] = pool_size  # the cross-process page
p.wp[:, :, :, 0] = 1
stacked = {k: np.stack([getattr(p, k)] * n_shards)[:, None]
           for k in _PLAN_KEYS}
cur_idx = np.ones((n_shards, 1), np.int32)

mesh = Mesh(np.array(jax.devices()), ("frame",))
shard = NamedSharding(mesh, P("frame"))


def mk_global(a):
    local = a[proc_id : proc_id + 1]
    return jax.make_array_from_single_device_arrays(
        a.shape, shard,
        [jax.device_put(local, jax.local_devices()[0])])


g_args = [mk_global(pools_y), mk_global(pools_cb), mk_global(pools_cr)]
g_st = {k: mk_global(v) for k, v in stacked.items()}
g_cur = mk_global(cur_idx)

step = h264_gop_xchg_step(mesh, mb_w, mb_h, pool_size, handoff_slot=0,
                          has_i8=False, deblock=False)
pool, outs = step(*g_args, g_st, g_cur)
local_y = np.asarray(
    [s.data for s in outs[0].addressable_shards][0])[0, 0]

if proc_id == 1:
    # zero-MV copy of process 0's handoff frame
    assert (local_y == pools_y[0, 0]).all(), "cross-process page wrong"
print(f"proc {proc_id} OK", flush=True)
