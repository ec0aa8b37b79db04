"""Overlapped two-phase single-stream decode (H.264).

The serial decoder interleaves Phase A (host entropy decode) with
Phase B (reconstruction) per picture.  This driver decouples them the
way the bench's turbo path does (SURVEY §7; reference threadplayer's
decode-ahead stage, threadplayer.cpp:313-362): the native C++ Phase A
runs ahead producing plan tensors, whole-GOP batches dispatch
ASYNCHRONOUSLY to the device (BatchedPhaseB: one lax.scan graph per
batch, frame pool device-resident), and DPB output events — captured at
exactly the points the serial decoder would emit frames
(m2decoder.h:132-157 pull loop) — materialize lazily once their batch's
device arrays exist.  Output frames, order, and error containment are
bit-identical to the serial path; only the phase overlap differs.
"""

from __future__ import annotations

from collections import deque
from dataclasses import replace

import numpy as np


class TurboH264Decoder:
    """Overlapped Phase A / Phase B H.264 stream decoder.

    batch: pictures per device dispatch (one jit graph per batch
    length; the last partial batch of a stream compiles its own
    geometry).  Output latency is bounded by one batch.
    """

    def __init__(self, data: bytes, batch: int = 12, dpb_max: int = -1):
        from m2dec_tpu.codecs.h264.decoder import H264Decoder

        self.batch = int(batch)
        self.dec = H264Decoder(native=True, plan_alloc="empty",
                               dpb_max=dpb_max)
        self.dec.set_data(data)
        self.error = 0  # last decode_picture status (<0 at EOS)

    # ------------------------------------------------------------------
    def frames(self):
        """Yield materialized DecodedFrames in output (DPB) order."""
        for frm, outs, i in self.device_frames():
            if outs is None:
                yield frm
                continue
            yield replace(frm, y=np.asarray(outs[0][i]),
                          cb=np.asarray(outs[1][i]),
                          cr=np.asarray(outs[2][i]))

    def device_frames(self):
        """Yield (frame-meta, outs, row) with planes DEVICE-RESIDENT:
        the serving/golden-checksum contract — consumers index
        outs[0..2][row] on device and nothing rides d2h unless they
        pull it (runtime/golden.CksWriter pulls 8 bytes/frame)."""
        dec = self.dec
        batcher = None  # created lazily at first dispatch
        undisp: list = []  # plans awaiting dispatch (decode order)
        pool_sizes: dict = {}  # id(plan) -> frame-pool size at decode
        stores: dict = {}  # id(plan) -> (outs, row)
        last_plan: dict = {}  # pool slot -> plan that wrote it
        events: deque = deque()  # (DecodedFrame meta, plan)

        def dispatch():
            nonlocal batcher
            if not undisp:
                return
            from m2dec_tpu.codecs.h264.reconstruct import BatchedPhaseB

            # geometry snapshot from the plans being dispatched (NOT
            # the decoder's current state: on a mid-stream geometry
            # change the decoder has already switched to the new shape
            # while these plans were decoded under the old one)
            geom = (undisp[0].mb_w, undisp[0].mb_h, pool_sizes[id(undisp[0])])
            for p in undisp:
                pool_sizes.pop(id(p), None)
            if batcher is None or (batcher.mb_w, batcher.mb_h,
                                   batcher.pool[0].shape[0]) != geom:
                batcher = BatchedPhaseB(*geom)
            outs = batcher.run_async(undisp)
            for i, p in enumerate(undisp):
                stores[id(p)] = (outs, i)
            undisp.clear()

        def capture(bypass=False):
            idx, frm = dec.pop_decoded_index(bypass)
            while idx >= 0:
                events.append((frm, last_plan.get(idx)))
                idx, frm = dec.pop_decoded_index(bypass)

        def emit_ready(flush=False):
            while events:
                frm, plan = events[0]
                ent = stores.get(id(plan)) if plan is not None else None
                if ent is None:
                    if plan in undisp and flush:
                        dispatch()
                        continue
                    if plan is None:
                        # a frame the DPB output before any picture
                        # completed a plan (cannot happen in practice;
                        # emit the empty pool frame as the serial path
                        # would)
                        events.popleft()
                        yield frm, None, None
                        continue
                    break
                events.popleft()
                outs, i = ent
                del stores[id(plan)]
                yield frm, outs, i

        while True:
            capture()
            yield from emit_ready()
            err = dec.decode_picture()
            self.error = err
            if err == 1:
                from m2dec_tpu.codecs.h264.reconstruct import dev_pool_size

                plan = dec.plans.pop()
                pool_sizes[id(plan)] = dev_pool_size(
                    dec.sps.num_ref_frames, len(dec.frames))
                last_plan[dec.cur_idx] = plan
                # split the pending batch on ANY geometry change —
                # mb dims or device-pool size (an SPS raising
                # num_ref_frames at the same resolution needs a bigger
                # device pool; mixing pool sizes in one batch would
                # overflow _DevSlotMap)
                if undisp and (
                        (undisp[0].mb_w, undisp[0].mb_h,
                         pool_sizes[id(undisp[0])]) !=
                        (plan.mb_w, plan.mb_h, pool_sizes[id(plan)])):
                    dispatch()  # geometry changed mid-stream
                undisp.append(plan)
                if len(undisp) >= self.batch:
                    dispatch()
                continue
            # EOS or truncation (err < 0): the serial path drains the
            # DPB with bypass (m2decoder.h:137-143); flush pending
            # Phase-B work first so every drained frame materializes
            dispatch()
            capture(bypass=True)
            yield from emit_ready(flush=True)
            return

    def decode_all(self):
        return list(self.frames())


class TurboH265Decoder:
    """Overlapped Phase A / Phase B H.265 stream decoder (the H.264
    driver's structure on the HEVC engine): native C++ Phase A runs
    ahead collecting H265Plans, whole-GOP batches dispatch to the
    device as ONE lax.scan graph each (H265SeqPhaseB, frame pool
    device-resident), and DPB output events — recorded as pool indexes
    by the decoder's defer mode — materialize lazily from the batch
    outs. Output frames and order are identical to the serial
    decode_all(backend="native") path.

    Row-aligned multi-slice pictures dispatch as single-picture graphs
    against the same device pool (the per-segment deblock+SAO replay is
    jit-keyed on the slice-row tuple, so it cannot ride the batched
    scan); mid-row slice starts keep the serial Python path, a
    reference-bug domain (chroma base derived as luma_offset>>1)."""

    def __init__(self, data: bytes, batch: int = 8):
        from m2dec_tpu.codecs.h265.headers import H265Decoder

        self.batch = int(batch)
        self.dec = H265Decoder()
        self.dec.set_data(data)
        self.dec.begin_decode(backend="native", defer_recon=True)
        self.error = 0

    def frames(self):
        """Yield materialized DecodedFrames in output (DPB) order."""
        for frm, outs, i in self.device_frames():
            if outs is None:
                yield frm
                continue
            yield replace(frm, y=np.asarray(outs[0][i]),
                          cb=np.asarray(outs[1][i]),
                          cr=np.asarray(outs[2][i]))

    def device_frames(self):
        """Yield (frame-meta, outs, row) with planes DEVICE-RESIDENT
        (same contract as TurboH264Decoder.device_frames); rows with
        outs=None carry their (zero) planes on the meta itself."""
        dec = self.dec
        batcher = None
        undisp: list = []
        stores: dict = {}   # id(plan) -> (outs, row)
        last_plan: dict = {}  # pool idx -> plan that wrote it
        events: deque = deque()
        plans_seen = 0

        batcher_geom = None

        def ensure_batcher(p0):
            nonlocal batcher, batcher_geom
            from m2dec_tpu.codecs.h265.reconstruct import H265SeqPhaseB

            geom = (p0.H, p0.W, p0.size_log2, p0.pic_width,
                    p0.pic_height)
            if batcher is None or batcher_geom != geom:
                batcher = H265SeqPhaseB(
                    p0.H, p0.W, len(dec.pool), p0.size_log2,
                    p0.pic_width, p0.pic_height)
                batcher_geom = geom
            return batcher

        def dispatch():
            if not undisp:
                return
            outs = ensure_batcher(undisp[0]).run_async(undisp)
            for i, p in enumerate(undisp):
                stores[id(p)] = (outs, i)
            undisp.clear()

        def harvest_plans():
            nonlocal plans_seen
            while plans_seen < len(dec.plans):
                p = dec.plans[plans_seen]
                dec.plans[plans_seen] = None  # consumed: let it free
                plans_seen += 1
                last_plan[p.cur_idx] = p
                # seed the expected event count up front: the DPB
                # inserts a picture once per slice segment, and the
                # pops may land in different capture rounds — a lazy
                # per-capture increment would free the batch store
                # after the first pop (advisor r4)
                refcnt[id(p)] = (len(p.slice_rows)
                                 if p.multi_slice else 1)
                # mid-stream geometry change: dispatch the pending batch
                # before mixing shapes (mirrors the H.264 driver)
                if undisp and (undisp[0].H, undisp[0].W) != (p.H, p.W):
                    dispatch()
                if p.multi_slice:
                    # pool-order dependency: flush pending singles,
                    # then run this picture's own slice-replay graph
                    dispatch()
                    outs = ensure_batcher(p).run_async_one(p)
                    stores[id(p)] = (outs, 0)
                    continue
                undisp.append(p)
                if len(undisp) >= self.batch:
                    dispatch()

        # a multi-slice picture is inserted into the DPB once per slice
        # segment (reference slice_layer parity, h265.cpp:4849-4866) so
        # the SAME plan backs several output events; its batch store
        # entry must survive until the last one materializes
        refcnt: dict = {}  # id(plan) -> pending event count

        def capture(is_end=False):
            # bind the plan at event time: the pool slot may be reused
            # by a later picture before this event materializes
            idx, frm = dec.pop_decoded_index(is_end)
            while idx >= 0:
                events.append((frm, last_plan.get(idx)))
                idx, frm = dec.pop_decoded_index(is_end)

        def emit_ready(flush=False):
            while events:
                frm, plan = events[0]
                ent = stores.get(id(plan)) if plan is not None else None
                if ent is None:
                    if plan is not None and any(
                            p is plan for p in undisp) and flush:
                        dispatch()
                        continue
                    if plan is None:
                        # frame emitted before any plan wrote its slot
                        # (empty pool frame) — zero planes
                        events.popleft()
                        z = np.zeros((frm.height, frm.width), np.uint8)
                        zc = np.zeros((frm.height >> 1, frm.width >> 1),
                                      np.uint8)
                        yield replace(frm, y=z, cb=zc, cr=zc), None, None
                        continue
                    break
                events.popleft()
                outs, i = ent
                refcnt[id(plan)] -= 1
                if refcnt[id(plan)] <= 0:  # free outs once consumed
                    del stores[id(plan)]
                    del refcnt[id(plan)]
                yield frm, outs, i

        while True:
            err = dec.decode_picture()
            self.error = err
            harvest_plans()
            capture()
            yield from emit_ready()
            if err == 1:
                continue
            # EOS/truncation: the decoder's EOS path finalized the last
            # plan; flush and drain the DPB
            harvest_plans()
            dispatch()
            capture(is_end=True)
            yield from emit_ready(flush=True)
            return

    def decode_all(self):
        return list(self.frames())


class TurboMpeg2Decoder:
    """Overlapped Phase A / Phase B MPEG-1/2 stream decoder: native (or
    Python-fallback) Phase A runs ahead collecting plans + frame-slot
    triples (decoder defer mode), whole-GOP batches dispatch as ONE
    lax.scan graph each (Mpeg2SeqPhaseB, 4-slot pool device-resident),
    out_state-ordered output events materialize lazily from batch outs.
    Field pictures ride the same batched graph (the plan tensors
    capture the reference field decode model)."""

    def __init__(self, data: bytes, batch: int = 12, num_frames=4):
        from m2dec_tpu.codecs.mpeg2.decoder import Mpeg2Decoder

        self.batch = int(batch)
        self.dec = Mpeg2Decoder(num_frames=num_frames, defer_recon=True)
        self.dec.set_data(data)
        self.error = 0

    def frames(self):
        for frm, outs, i in self.device_frames():
            if outs is None:
                yield frm
                continue
            yield replace(frm, y=np.asarray(outs[0][i]),
                          cb=np.asarray(outs[1][i]),
                          cr=np.asarray(outs[2][i]))

    def device_frames(self):
        dec = self.dec
        batcher = None
        undisp: list = []     # (plan, cur, r0, r1)
        stores: dict = {}     # id(plan) -> (outs, row)
        last_plan: dict = {}  # pool slot -> plan
        events: deque = deque()
        seen = 0

        def dispatch():
            nonlocal batcher
            if not undisp:
                return
            from m2dec_tpu.codecs.mpeg2.reconstruct import Mpeg2SeqPhaseB

            if batcher is None:
                batcher = Mpeg2SeqPhaseB(dec.seq.mb_w, dec.seq.mb_h,
                                         len(dec.pool.frames))
            outs = batcher.run_async(undisp)
            for i, it in enumerate(undisp):
                stores[id(it[0])] = (outs, i)
            undisp.clear()

        def harvest():
            nonlocal seen
            while seen < len(dec.plans):
                it = dec.plans[seen]
                dec.plans[seen] = None  # consumed: let it free
                seen += 1
                last_plan[it[1]] = it[0]
                undisp.append(it)
                if len(undisp) >= self.batch:
                    dispatch()

        def capture(is_end=False):
            idx, frm = dec.pop_decoded_index(is_end)
            while idx >= 0:
                events.append((frm, last_plan.get(idx)))
                idx, frm = dec.pop_decoded_index(is_end)

        def emit_ready(flush=False):
            while events:
                frm, plan = events[0]
                ent = stores.get(id(plan)) if plan is not None else None
                if ent is None:
                    if plan is not None and any(
                            it[0] is plan for it in undisp) and flush:
                        dispatch()
                        continue
                    if plan is None:
                        events.popleft()
                        H = dec.seq.mb_h * 16
                        W = dec.seq.mb_w * 16
                        z = np.zeros((H, W), np.uint8)
                        zc = np.zeros((H >> 1, W >> 1), np.uint8)
                        yield replace(frm, y=z, cb=zc, cr=zc), None, None
                        continue
                    break
                events.popleft()
                outs, i = ent
                del stores[id(plan)]  # free batch outs once consumed
                yield frm, outs, i

        while True:
            capture()
            yield from emit_ready()
            err = dec.decode_data()
            self.error = err
            harvest()
            if err == 1:
                continue
            dispatch()
            capture(is_end=True)
            yield from emit_ready(flush=True)
            return

    def decode_all(self):
        return list(self.frames())
