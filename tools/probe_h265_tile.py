"""Time the production H.265 CTU-tile wavefront (rolling-window
lax.scan) on the real 1080p bench plan's tensors — compile + warm
ms/pic with a true 1-element device-side pull.

Usage: python tools/probe_h265_tile.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    import jax
    import jax.numpy as jnp

    from m2dec_tpu.codecs.h265 import reconstruct as RC
    from m2dec_tpu.codecs.h265.headers import H265Decoder

    data = (REPO / "build" / "bench" / "h265_1920x1088_v1.265").read_bytes()
    dec = H265Decoder()
    dec.set_data(data)
    dec.begin_decode(collect_plans=True, backend="native", defer_recon=True)
    dec.decode_picture(); dec.decode_picture()  # finish_picture runs at next call
    plan = dec.plans[0]
    print("plan", plan.H, plan.W, "ctb", plan.size_log2)
    zl, zc, act_l, act_c, n_act = RC._plan_zslots(plan)
    print("active diagonals: luma", n_act[0], "chroma", n_act[1])

    H, W = plan.H, plan.W
    y = np.zeros((H + 33, W + 33), np.int32)
    ry = np.zeros((H + 33, W + 33), np.int32)
    Hc = H >> 1
    cst = np.zeros((2 * (Hc + 17), (W >> 1) + 17), np.int32)

    C = 1 << plan.size_log2
    cols, rows = W >> plan.size_log2, H >> plan.size_log2
    slots_l = RC._zslot_table(plan.size_log2)

    def mk():
        def fn(y_, cbcr_, ry_, rc_, zl_, zc_, al_, ac_, na_):
            return RC._wavefront_tile(y_, cbcr_, ry_, rc_, zl_, zc_,
                                      al_, ac_, na_, False, H, W,
                                      plan.size_log2)
        return jax.jit(fn)

    Hc = H >> 1
    cbcr = np.zeros((2 * (Hc + 17), (W >> 1) + 17), np.int32)
    rcbcr = np.zeros_like(cbcr)
    fn = mk()
    t0 = time.time()
    r = fn(y, cbcr, ry, rcbcr, zl, zc, act_l, act_c, n_act)
    _ = np.asarray(r[0])[:1, :1]
    tc = time.time() - t0
    reps = []
    for _i in range(3):
        t0 = time.time()
        r = fn(y, cbcr, ry, rcbcr, zl, zc, act_l, act_c, n_act)
        _ = np.asarray(r[0])[:1, :1]
        reps.append(time.time() - t0)
    print(f"full tile wavefront: compile {tc:6.1f}s "
          f"warm {min(reps)*1e3:8.1f} ms/pic")


if __name__ == "__main__":
    main()
