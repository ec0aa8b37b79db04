#!/usr/bin/env python3
"""Serialize the intra_scan TPU executable and histogram its halfwords
to see whether fp16 one-hot literals dominate it too."""
import pathlib
import sys
from collections import Counter

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from m2dec_tpu.codecs.h264 import wavefront as WF  # noqa: E402

MBW, MBH = 120, 68
H, W = MBH * 16, MBW * 16
g = WF.get_geom(MBW, MBH)
nd, lmax = g["nd"], g["lmax"]
Pd = {"kind": jnp.zeros((nd, lmax), jnp.int32),
      "res_y": jnp.zeros((nd, lmax, 16, 16), jnp.int32),
      "res_c": jnp.zeros((nd, lmax, 2, 8, 8), jnp.int32),
      "i4_modes": jnp.zeros((nd, lmax, 16), jnp.int32),
      "i4_avail": jnp.zeros((nd, lmax, 16), jnp.int32),
      "i16_mode": jnp.zeros((nd, lmax), jnp.int32),
      "chroma_mode": jnp.zeros((nd, lmax), jnp.int32),
      "mb_avail": jnp.zeros((nd, lmax), jnp.int32)}
sky = jnp.zeros((WF.MT + H + WF.MB_, WF.ML + nd * 16 + WF.MR), jnp.int32)
skc = jnp.zeros((WF.MTC + H // 2 + WF.MBC, WF.MLC + nd * 8 + WF.MRC),
                jnp.int32)
c = jax.jit(lambda a, b, cc, Pp: WF.intra_scan(a, b, cc, Pp, g, False,
                                               jnp)).lower(
    sky, skc, skc, Pd).compile()
blob = c.runtime_executable().serialize()
print("size:", len(blob) / 1e6, "MB", file=sys.stderr)
h = np.frombuffer(blob, np.uint8)
hw = h[: len(h) // 2 * 2].view(np.uint16)
cnt = Counter(hw[::4].tolist())
tot = len(hw[::4])
for v, n in cnt.most_common(10):
    print(f"0x{v:04x} {n/tot*100:5.1f}%", file=sys.stderr)
