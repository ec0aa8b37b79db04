"""Randomized H.264 syntax-stream generator for decoder conformance tests.

Same philosophy as mpeg2_enc.py: emit random-but-valid Annex-B streams and
let the compiled reference decoder define golden output. Feature coverage
grows with the decoder: IPCM -> intra CAVLC -> P -> B -> CABAC.
"""

from __future__ import annotations

import random

import numpy as np

from m2dec_tpu.bitstream import BitWriter
from m2dec_tpu.bitstream.writer import escape_nal
from m2dec_tpu.codecs.h264 import tables as T

ENC_COEFF_TOKEN = [T.invert(t) for t in T.COEFF_TOKEN]
ENC_TOTAL_ZEROS = [None] + [T.invert(t) for t in T.TOTAL_ZEROS[1:]]
ENC_TOTAL_ZEROS_C = [None] + [T.invert(t) for t in T.TOTAL_ZEROS_CHROMA[1:]]
ENC_RUN_BEFORE = {k: T.invert(t) for k, t in T.RUN_BEFORE.items()}
ENC_ME_CBP = [
    {cbp: codenum for codenum, cbp in enumerate(lut)} for lut in T.ME_CBP
]


class H264StreamGen:
    def __init__(self, width, height, seed=0, qp=26, num_ref_frames=1,
                 disable_deblock=True, level_idc=40, chroma_qp_index=0):
        assert width % 16 == 0 and height % 16 == 0
        self.w, self.h = width, height
        self.mb_w, self.mb_h = width >> 4, height >> 4
        self.rng = random.Random(seed)
        self.qp = qp
        self.num_ref_frames = num_ref_frames
        self.disable_deblock = disable_deblock
        self.level_idc = level_idc
        self.chroma_qp_index = chroma_qp_index
        self.frame_num = 0
        self.poc_lsb = 0
        self.log2_max_frame_num = 8
        self.log2_max_poc_lsb = 8

    # ----------------------------------------------------------- NALs ----
    def _nal(self, out, nal_ref_idc, nal_type, payload_writer):
        w = BitWriter()
        payload_writer(w)
        w.rbsp_trailing_bits()
        out += b"\x00\x00\x01"
        out.append((nal_ref_idc << 5) | nal_type)
        out += escape_nal(w.tobytes())

    def _sps(self, w):
        w.put_bits(66, 8)  # baseline
        w.put_bits(0, 8)  # constraint flags
        w.put_bits(self.level_idc, 8)
        w.ue(0)  # sps_id
        w.ue(self.log2_max_frame_num - 4)
        w.ue(0)  # poc_type 0
        w.ue(self.log2_max_poc_lsb - 4)
        w.ue(self.num_ref_frames)
        w.put_bits(0, 1)  # gaps
        w.ue(self.mb_w - 1)
        w.ue(self.mb_h - 1)
        w.put_bits(1, 1)  # frame_mbs_only
        w.put_bits(0, 1)  # direct_8x8_inference
        w.put_bits(0, 1)  # cropping
        w.put_bits(0, 1)  # vui

    def _pps(self, w):
        w.ue(0)  # pps_id
        w.ue(0)  # sps_id
        w.put_bits(0, 1)  # entropy: CAVLC
        w.put_bits(0, 1)  # pic_order_present
        w.ue(0)  # num_slice_groups-1
        w.ue(max(0, self.num_ref_frames - 1))  # l0_active-1
        w.ue(0)  # l1_active-1
        w.put_bits(0, 1)  # weighted_pred
        w.put_bits(0, 2)  # weighted_bipred
        w.se(self.qp - 26)
        w.se(0)  # qs
        w.se(self.chroma_qp_index)
        w.put_bits(1, 1)  # deblocking_filter_control_present
        w.put_bits(0, 1)  # constrained_intra
        w.put_bits(0, 1)  # redundant_pic_cnt

    # ---------------------------------------------------------- stream ---
    def generate(self, pattern="II"):
        """pattern: 'I' = IDR all-intra picture (more types as the decoder
        grows)."""
        out = bytearray()
        self._nal(out, 3, 7, self._sps)
        self._nal(out, 3, 8, self._pps)
        for c in pattern:
            if c == "I":
                self._idr_picture(out)
            else:
                raise NotImplementedError(c)
        return bytes(out)

    def _idr_picture(self, out):
        self.frame_num = 0
        self.poc_lsb = 0
        self._nal(out, 3, 5, lambda w: self._slice_I(w, idr=True))
        self.frame_num = (self.frame_num + 1) % (1 << self.log2_max_frame_num)
        self.poc_lsb = (self.poc_lsb + 2) % (1 << self.log2_max_poc_lsb)

    # ----------------------------------------------------------- slice ---
    def _slice_I(self, w, idr):
        rng = self.rng
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I (all slices)
        w.ue(0)  # pps_id
        w.put_bits(self.frame_num, self.log2_max_frame_num)
        if idr:
            w.ue(0)  # idr_pic_id
        w.put_bits(self.poc_lsb, self.log2_max_poc_lsb)
        if idr:
            w.put_bits(0, 1)  # no_output_of_prior_pics
            w.put_bits(0, 1)  # long_term_reference
        else:
            w.put_bits(0, 1)  # adaptive_ref_pic_marking
        self.qp_cur = self.qp
        w.se(0)  # slice_qp_delta
        # deblocking control (control_present=1 in PPS)
        if self.disable_deblock:
            w.ue(1)
        else:
            w.ue(0)
            w.se(rng.randint(-6, 6))
            w.se(rng.randint(-6, 6))
        # state for intra pred mode prediction and nC tracking
        self._init_slice_state()
        for mb in range(self.mb_w * self.mb_h):
            self._macroblock_I(w, mb)

    def _init_slice_state(self):
        self.top_pred = [[2] * 4 for _ in range(self.mb_w)]
        self.left_pred = [0] * 4
        self.top_coef = [[0] * 8 for _ in range(self.mb_w)]
        self.left_coef = [0] * 8
        self.mb_count = 0

    # ------------------------------------------------------ macroblocks ---
    def _macroblock_I(self, w, mb_idx):
        self._emit_ipcm(w)

    def _emit_ipcm(self, w):
        rng = self.rng
        w.ue(25)  # I_PCM
        w.byte_align(0)
        for _ in range(256 + 128):
            w.put_bits(rng.randrange(256), 8)
        mbx = self.mb_count % self.mb_w
        self.left_pred[:] = [2] * 4
        self.top_pred[mbx][:] = [2] * 4
        self.left_coef[:] = [15] * 8
        self.top_coef[mbx][:] = [15] * 8
        self.mb_count += 1
