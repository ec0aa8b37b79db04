"""Device-side golden-output checksums (VERDICT r2 #8).

The reference's golden mode writes one MD5 per cropped output frame
(FileWriterMd5, /root/reference/src/app/filewrite.h:91-125). MD5 is
bit-serial over the byte stream — unusable on TPU and pointless to pull
37 MB/frame through a ~MB/s d2h path just to hash on the host. The TPU
serving contract keeps frames device-resident (HBM); golden mode
computes a STRONG PER-FRAME CHECKSUM on device and pulls 8 bytes per
frame:

    cks(frame) = (sum(b_i) mod 2^32,
                  sum(b_i * ((i mod 8191) + 1)) mod 2^32)

over the frame's cropped NV12 byte stream b (the exact bytes the
reference's raw writer would emit: cropped luma rows, then interleaved
CbCr rows). The weighted term makes the checksum position-sensitive
(8191 prime; any single-byte or swap corruption changes it). The text
format is one line per output frame:

    <frame#>: <sum:08x> <wsum:08x>

``host_cks_file`` produces the identical file from a raw ``.out`` dump
(e.g. the reference binary's ``-o`` output), so goldens can be checked
end-to-end without materializing the TPU frames.
"""

from __future__ import annotations

import functools

import numpy as np


def host_frame_cks(frame_bytes: bytes | np.ndarray) -> tuple[int, int]:
    """Checksum of one cropped NV12 frame byte string (host)."""
    b = np.frombuffer(frame_bytes, np.uint8) \
        if isinstance(frame_bytes, (bytes, bytearray)) \
        else np.ascontiguousarray(frame_bytes).reshape(-1)
    v = b.astype(np.uint64)
    w = (np.arange(v.size, dtype=np.uint64) % 8191) + 1
    return (int(v.sum() & 0xFFFFFFFF),
            int((v * w).sum() & 0xFFFFFFFF))


def host_cks_file(raw: bytes, width: int, height: int) -> str:
    """The .cks text for a raw NV12 dump (frame-size = w*h*3/2)."""
    fs = width * height * 3 // 2
    n = len(raw) // fs
    lines = []
    for i in range(n):
        s, ws = host_frame_cks(raw[i * fs : (i + 1) * fs])
        lines.append(f"{i}: {s:08x} {ws:08x}")
    return "\n".join(lines) + ("\n" if lines else "")


@functools.lru_cache(maxsize=16)
def _jitted_frame_cks(H, W, crop):
    """Device checksum of one frame's cropped NV12 byte stream.

    crop = (left, right, top, bottom) in luma pixels (the reference's
    m2d_frame_t crop convention)."""
    import jax
    import jax.numpy as jnp

    cl, cr_, ct, cb_ = crop
    w = W - cl - cr_
    h = H - ct - cb_

    def cks(y, cb, cr):
        ys = y[ct : ct + h, cl : cl + w].reshape(-1)
        cbs = cb[ct // 2 : (ct + h) // 2, cl // 2 : (cl + w) // 2]
        crs = cr[ct // 2 : (ct + h) // 2, cl // 2 : (cl + w) // 2]
        nv = jnp.stack([cbs, crs], axis=-1).reshape(-1)
        b = jnp.concatenate([ys, nv]).astype(jnp.uint32)
        L = b.shape[0]
        # fold into [C, 8191] so the weight vector stays one small
        # constant (a flat arange(L) % 8191 would constant-fold into a
        # giant literal — see reconstruct._jitted_checksum)
        C = -(-L // 8191)
        pad = C * 8191 - L
        fp = jnp.pad(b, (0, pad)).reshape(C, 8191)
        wv = jnp.arange(1, 8192, dtype=jnp.uint32)
        return jnp.stack([fp.sum(dtype=jnp.uint32),
                          (fp * wv[None, :]).sum(dtype=jnp.uint32)])

    return jax.jit(cks)


def device_frame_cks(y, cb, cr, crop) -> tuple[int, int]:
    """Checksum a device-resident frame; pulls 8 bytes d2h."""
    H, W = y.shape
    out = np.asarray(_jitted_frame_cks(H, W, tuple(crop))(y, cb, cr))
    return int(out[0]), int(out[1])


class CksWriter:
    """FileWriterMd5 analog for the device-resident serving contract:
    one checksum line per output frame, frames never leave HBM."""

    def __init__(self, path):
        self.f = open(path, "w")
        self.n = 0

    def write_device_frame(self, y, cb, cr, crop):
        s, ws = device_frame_cks(y, cb, cr, crop)
        self.f.write(f"{self.n}: {s:08x} {ws:08x}\n")
        self.n += 1

    def write_host_frame(self, frame_bytes):
        s, ws = host_frame_cks(frame_bytes)
        self.f.write(f"{self.n}: {s:08x} {ws:08x}\n")
        self.n += 1

    def close(self):
        self.f.close()
