"""Decode-state checkpoint/resume (SURVEY §5.4).

The reference has no checkpointing; its closest analogs are frame
skipping with header replay (m2decoder.h:96-131) and the DPB bypass
output mode.  For multi-host GOP sharding and preemptible serving, the
TPU build adds real decode-state checkpoints: at any picture boundary
the full decoder state — active SPS/PPS, POC counters, DPB, frame pool
pixels, reference lists and colocated-MV pages, LRU/output state — is
serialized to one opaque blob.  A fresh process restores the blob and
continues decoding from the recorded stream offset with bit-exact
output.

Usage:
    blob, pos = save(dec)            # at a picture boundary
    dec2 = load(blob)
    dec2.set_data(data[pos:])        # same elementary stream, resumed
    dec2.decode_picture() ...        # identical frames from here on

Checkpoint payloads are produced and consumed by this library only —
they are pickles of internal decoder state, not an interchange format.
"""

from __future__ import annotations

import io
import pickle

MAGIC = b"m2dtpu-ckpt1"


def save(dec) -> tuple[bytes, int]:
    """Serialize decoder state; returns (blob, stream_pos) where
    stream_pos is the byte offset of the first undecoded start code in
    the buffer last passed to set_data (vtable stream_pos parity,
    m2d.h:69)."""
    buf = io.BytesIO()
    buf.write(MAGIC)
    pickle.dump(dec, buf, protocol=pickle.HIGHEST_PROTOCOL)
    return buf.getvalue(), dec.stream_pos()


def load(blob: bytes):
    """Restore a decoder checkpointed by save(). The caller re-attaches
    the remaining stream with set_data(data[stream_pos:])."""
    if blob[: len(MAGIC)] != MAGIC:
        raise ValueError("not a m2dec_tpu checkpoint")
    return pickle.loads(blob[len(MAGIC):])
