"""Randomized H.265 conformance-stream generator (CABAC).

Emits SPS/PPS + IDR I-slices for the currently-implemented decode
profile: single slice per picture, SAO/deblocking/scaling/PCM disabled,
intra CUs with no residual (all cbf = 0) in milestone 1.

Syntax shapes mirror the reference parser exactly (h265.cpp:553-720
parameter sets incl. the init_qp_minus26-read-as-ue quirk;
slice_header :858-938; CTU walk :4100+). The CABAC arithmetic encoder is
the shared spec 9.3.4 engine from h264_enc, re-initialized with the
H.265 context table.
"""

from __future__ import annotations

import random

from m2dec_tpu.bitstream.writer import BitWriter, escape_nal
from m2dec_tpu.codecs.h265 import cabac_tables as HT

from .h264_enc import CabacEncoder

NAL_IDR_W_RADL = 19
NAL_SPS, NAL_PPS = 33, 34


class H265CabacEncoder(CabacEncoder):
    """CabacEncoder with the HEVC context bank + init table."""

    def __init__(self, w, slice_qp, idc):
        super().__init__(w, slice_qp, 0)
        ctx = [0] * HT.NUM_CTX
        for i, (m, n) in enumerate(HT.INIT_MN[idc]):
            pre = ((m * slice_qp) >> 4) + n
            if pre < 64:
                pre = 1 if pre <= 0 else pre
                ctx[i] = (63 - pre) * 2
            else:
                pre = 126 if pre > 126 else pre
                ctx[i] = (pre - 64) * 2 + 1
        self.ctx = ctx


#: intra modes the decoder implements so far
M1_MODES = (0, 1, 10, 26)


class H265StreamGen:
    def __init__(self, width, height, seed=0, ctb_log2=4, min_cb_log2=3,
                 qp=30, modes=M1_MODES, split_prob=0.4, nxn_prob=0.4):
        self.w = width
        self.h = height
        self.rng = random.Random(seed)
        self.ctb_log2 = ctb_log2
        self.min_cb_log2 = min_cb_log2
        self.min_tb_log2 = 2
        self.max_tb_log2 = min(ctb_log2, 5)
        self.qp = qp
        self.modes = modes
        self.split_prob = split_prob
        self.nxn_prob = nxn_prob
        self.cols = (width + (1 << ctb_log2) - 1) >> ctb_log2
        self.rows = (height + (1 << ctb_log2) - 1) >> ctb_log2

    # -- NAL plumbing ---------------------------------------------------
    def _nal(self, out, nal_type, payload_writer):
        w = BitWriter()
        w.put_bits(0, 1)  # forbidden_zero
        w.put_bits(nal_type, 6)
        w.put_bits(0, 6)  # nuh_layer_id
        w.put_bits(1, 3)  # nuh_temporal_id_plus1
        payload_writer(w)
        out += b"\x00\x00\x00\x01" + escape_nal(w.tobytes())

    # -- parameter sets -------------------------------------------------
    def _ptl(self, w):
        w.put_bits(0, 8)    # profile space/tier/idc (Main-ish: idc 1)
        w.put_bits(0, 32)   # compat flags
        for _ in range(6):
            w.put_bits(0, 8)
        w.put_bits(120, 8)  # level 4.0

    def _sps(self, w):
        w.put_bits(0, 4)  # vps_id
        w.put_bits(0, 3)  # max_sub_layers_minus1
        w.put_bits(1, 1)  # temporal_id_nesting
        self._ptl(w)
        w.ue(0)  # sps_id
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(self.w)
        w.ue(self.h)
        w.put_bits(0, 1)  # conformance window (reference derives crop
        # from pic size vs CTB padding on its own)
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.ue(4)  # log2_max_poc_lsb_minus4
        w.put_bits(1, 1)  # sub_layer_ordering_info_present
        w.ue(2)  # max_dec_pic_buffering_minus1
        w.ue(0)  # max_num_reorder
        w.ue(0)  # max_latency
        w.ue(self.min_cb_log2 - 3)
        w.ue(self.ctb_log2 - self.min_cb_log2)
        w.ue(self.min_tb_log2 - 2)
        w.ue(self.max_tb_log2 - self.min_tb_log2)
        w.ue(0)  # max_transform_hierarchy_depth_inter
        w.ue(0)  # max_transform_hierarchy_depth_intra
        w.put_bits(0, 1)  # scaling_list_enabled
        w.put_bits(0, 1)  # amp_enabled
        w.put_bits(0, 1)  # sao_enabled
        w.put_bits(0, 1)  # pcm_enabled
        # num_short_term_ref_pic_sets = 16: the reference sizes its
        # colocated-MV maps by the RPS count (set_second_frame,
        # h265.cpp:121-129) while the frame pool LRU marches through up
        # to 16 indices — fewer sets crash on the first unmapped index
        w.ue(16)
        for i in range(16):
            if i:
                w.put_bits(0, 1)  # inter_rps_pred_flag = 0
            w.ue(1)  # num_negative_pics
            w.ue(0)  # num_positive_pics
            w.ue(0)  # delta_poc_s0_minus1 -> -1
            w.put_bits(1, 1)  # used_by_curr_pic_s0
        w.put_bits(0, 1)  # long_term_ref_pics_present
        w.put_bits(0, 1)  # temporal_mvp
        w.put_bits(0, 1)  # strong_intra_smoothing
        w.put_bits(0, 1)  # vui_present
        w.rbsp_trailing_bits()

    def _pps(self, w):
        w.ue(0)  # pps_id
        w.ue(0)  # sps_id
        w.put_bits(0, 1)  # dependent_slice_segments
        w.put_bits(0, 1)  # output_flag_present
        w.put_bits(0, 3)  # num_extra_slice_header_bits
        w.put_bits(0, 1)  # sign_data_hiding
        w.put_bits(0, 1)  # cabac_init_present
        w.ue(0)  # num_ref_idx_l0_default_minus1
        w.ue(0)  # num_ref_idx_l1_default_minus1
        w.ue(self.qp - 26 if self.qp >= 26 else 0)  # QUIRK: read as ue
        w.put_bits(0, 1)  # constrained_intra_pred
        w.put_bits(0, 1)  # transform_skip
        w.put_bits(0, 1)  # cu_qp_delta
        w.se(0)  # cb_qp_offset
        w.se(0)  # cr_qp_offset
        w.put_bits(0, 1)  # slice_chroma_qp_offsets_present
        w.put_bits(0, 1)  # weighted_pred
        w.put_bits(0, 1)  # weighted_bipred
        w.put_bits(0, 1)  # transquant_bypass
        w.put_bits(0, 1)  # tiles
        w.put_bits(0, 1)  # entropy_coding_sync
        w.put_bits(0, 1)  # loop_filter_across_slices
        w.put_bits(1, 1)  # deblocking_filter_control_present
        w.put_bits(0, 1)  # deblocking_filter_override_enabled
        w.put_bits(1, 1)  # pps_deblocking_filter_disabled
        w.put_bits(0, 1)  # pps_scaling_list_data_present
        w.put_bits(0, 1)  # lists_modification
        w.ue(0)  # log2_parallel_merge_level_minus2
        w.put_bits(0, 1)  # slice_segment_header_extension
        w.put_bits(0, 1)  # pps_extension
        w.rbsp_trailing_bits()

    # -- slice ----------------------------------------------------------
    def _slice_header(self, w):
        w.put_bits(1, 1)  # first_slice_segment_in_pic
        w.put_bits(0, 1)  # no_output_of_prior_pics (IRAP)
        w.ue(0)  # pps_id
        w.ue(2)  # slice_type I
        w.se(self.qp - (26 + (self.qp - 26 if self.qp >= 26 else 0)))
        # deblocking control present but override disabled; disabled in PPS
        # byte alignment (reference skips 8 when already aligned)
        misalign = (-w.nbits) % 8
        w.put_bits(1 << (misalign - 1) if misalign else 0x80,
                   misalign if misalign else 8)

    # -- CTU emission ---------------------------------------------------
    def _emit_cu(self, enc, size_log2, unavail, left, li, top, ti):
        """One intra CU at `size_log2` (cbf all zero)."""
        rng = self.rng
        depth = 6 - size_log2  # intra_depth_fill convention
        num = 1 << (size_log2 - 2)
        for i in range(num):
            left[li + i]["depth"] = depth
            top[ti + i]["depth"] = depth
        part_nxn = False
        if size_log2 == self.min_cb_log2:
            part_nxn = rng.random() < self.nxn_prob
            enc.decision(HT.PART_MODE, 0 if part_nxn else 1)
        part_num = 4 if part_nxn else 1
        nnum = 1 << (size_log2 - 2 - (part_num == 4))
        # pass 1: choose modes and derive flag/payload with the SAME
        # neighbour evolution the decoder sees (fills between parts)
        modes, flags = [], []
        snap = [dict(x) for x in left], [dict(x) for x in top]
        for i in range(part_num):
            la = left[li + (i >> 1)]
            ta = top[ti + (i & 1)]
            cand = _candidates(la["mode"], ta["mode"])
            want = rng.choice(list(self.modes))
            if want in cand:
                flags.append((1, cand.index(want)))
            else:
                rem = want
                for c in cand:
                    if c < want:
                        rem -= 1
                flags.append((0, rem))
            modes.append(want)
            lt, tt = li + (i >> 1), ti + (i & 1)
            for k in range(nnum):
                left[lt + k]["mode"] = want
                top[tt + k]["mode"] = want
        # pass 2: bin order = all prev_intra flags, then per-part payload
        for f, _ in flags:
            enc.decision(HT.PREV_INTRA_LUMA_PRED_FLAG, f)
        for i in range(part_num):
            f, payload = flags[i]
            if f:
                if payload == 0:
                    enc.bypass(0)
                else:
                    enc.bypass(1)
                    enc.bypass(payload - 1)
            else:
                for b in range(4, -1, -1):
                    enc.bypass((payload >> b) & 1)
        luma0 = modes[0]
        # chroma: derived mode must stay in the implemented set
        choices = [4]
        for idx, base in ((0, 0), (1, 26), (2, 10), (3, 1)):
            derived = 34 if luma0 == base else base
            if derived in self.modes:
                choices.append(idx)
        cidx = rng.choice(choices)
        if cidx == 4:
            enc.decision(HT.INTRA_CHROMA_PRED_MODE, 0)
        else:
            enc.decision(HT.INTRA_CHROMA_PRED_MODE, 1)
            enc.bypass((cidx >> 1) & 1)
            enc.bypass(cidx & 1)
        # transform tree, all cbf zero
        self._emit_ttree(enc, size_log2, 0, 3, part_nxn)

    def _emit_ttree(self, enc, size_log2, depth, upper_cbf, intra_split):
        if self.max_tb_log2 < size_log2:
            split = 1
        elif depth == 0 and intra_split:
            split = 2
        else:
            split = 0  # hierarchy depths are 0: no split flag coded
        if 2 < size_log2:
            if upper_cbf & 2:
                enc.decision(HT.CBF_CHROMA + depth, 0)
            if upper_cbf & 1:
                enc.decision(HT.CBF_CHROMA + depth, 0)
            cbf = 0
        else:
            cbf = upper_cbf
        if split:
            for _ in range(4):
                self._emit_ttree(enc, size_log2 - 1, depth + 1, cbf, False)
        else:
            enc.decision(HT.CBF_LUMA + (depth == 0), 0)

    def _emit_quad(self, enc, size_log2, valid_x, valid_y, left, li,
                   top, ti):
        if valid_x <= 0 or valid_y <= 0:
            return
        size = 1 << size_log2
        boundary = valid_x < size or valid_y < size
        if self.min_cb_log2 < size_log2:
            split = boundary or self.rng.random() < self.split_prob
            if not boundary:
                inc = ((6 < size_log2 + left[li]["depth"])
                       + (6 < size_log2 + top[ti]["depth"]))
                enc.decision(HT.SPLIT_CU_FLAG + inc, int(split))
            if split:
                sl = size_log2 - 1
                bl = 1 << sl
                info = 1 << (sl - 2)
                minu = lambda v, b: min(v & 0xFFFFFFFF, b)  # noqa: E731
                self._emit_quad(enc, sl, valid_x, valid_y, left, li,
                                top, ti)
                self._emit_quad(enc, sl, valid_x - bl, minu(valid_y, bl),
                                left, li, top, ti + info)
                self._emit_quad(enc, sl, minu(valid_x, bl * 2),
                                valid_y - bl, left, li + info, top, ti)
                self._emit_quad(enc, sl, minu(valid_x - bl, bl),
                                minu(valid_y - bl, bl),
                                left, li + info, top, ti + info)
                return
        self._emit_cu(enc, size_log2, 0, left, li, top, ti)

    def _slice(self, w):
        self._slice_header(w)
        enc = H265CabacEncoder(w, self.qp, 0)
        nn = 16
        left = [{"mode": 1, "depth": 0} for _ in range(nn + 2)]
        top = [{"mode": 1, "depth": 0} for _ in range(self.cols * nn)]
        n_ctu = self.cols * self.rows
        ctb = 1 << self.ctb_log2
        for i in range(n_ctu):
            py, px = divmod(i, self.cols)
            valid_x = self.w - px * ctb
            valid_y = min(self.h - py * ctb, ctb)
            self._emit_quad(enc, self.ctb_log2, valid_x, valid_y,
                            left, 2, top, px * nn)
            # neighbour maintenance mirroring ctu_pos_increment
            if px == self.cols - 1:
                for nb in left[1:]:
                    nb["mode"], nb["depth"] = 1, 0
                nxt = 0
            else:
                left[1] = dict(left[0])
                nxt = px + 1
            left[0] = dict(top[((nxt + 1) << (self.ctb_log2 - 2)) - 1])
            base = nxt * nn
            for k in range(nn):
                top[base + k]["mode"] = 1
            if i != n_ctu - 1:
                enc.terminate(0)
        enc.terminate(1)
        w.byte_align(0)

    def generate(self, n_pics=1) -> bytes:
        out = bytearray()
        self._nal(out, NAL_SPS, self._sps)
        self._nal(out, NAL_PPS, self._pps)
        for _ in range(n_pics):
            self._nal(out, NAL_IDR_W_RADL, self._slice)
        return bytes(out)


def _candidates(a, b):
    if a == b:
        if a <= 1:
            return [0, 1, 26]
        return [a, ((a - 3) & 31) + 2, ((a - 1) & 31) + 2]
    if a != 0 and b != 0:
        c = 0
    elif a != 1 and b != 1:
        c = 1
    else:
        c = 26
    return [a, b, c]
