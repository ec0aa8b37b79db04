"""H.265 NAL + parameter-set parsing (reference h265.cpp:231-720).

Covers VPS/SPS/PPS with profile_tier_level, sub-layer ordering info,
conformance window, and the short-term RPS (both nopred and
inter-RPS-predicted forms, h265.cpp:392-488). The CTU decode stages
raise NotImplementedError until the entropy/reconstruction phases land.
"""

from __future__ import annotations

import dataclasses

from m2dec_tpu.bitstream import BitReader
from m2dec_tpu.bitstream.reader import find_start_codes, unescape_nal

# nal_unit_type (spec Table 7-1)
NAL_TRAIL_N, NAL_TRAIL_R = 0, 1
NAL_IDR_W_RADL, NAL_IDR_N_LP = 19, 20
NAL_VPS, NAL_SPS, NAL_PPS = 32, 33, 34


@dataclasses.dataclass
class ProfileTierLevel:
    profile_first8: int = 0
    compat_flags: int = 0
    second48: bytes = b""
    level_idc: int = 0


@dataclasses.dataclass
class StRefPicSet:
    """One short-term RPS: negative/positive delta-POC lists with
    used_by_curr flags (h265d_short_term_ref_pic_set_t)."""

    neg: tuple = ()
    pos: tuple = ()
    used_neg: int = 0
    used_pos: int = 0
    total_curr: int = 0


@dataclasses.dataclass
class Vps:
    id: int = 0
    max_layer: int = 0
    max_sub_layers: int = 1
    temporal_id_nesting_flag: int = 0
    ptl: ProfileTierLevel = dataclasses.field(default_factory=ProfileTierLevel)


@dataclasses.dataclass
class Sps:
    id: int = 0
    vps_id: int = 0
    chroma_format_idc: int = 1
    pic_width: int = 0
    pic_height: int = 0
    cropping: tuple = (0, 0, 0, 0)
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    log2_max_poc_lsb: int = 4
    max_dec_pic_buffering: tuple = ()
    log2_min_cb: int = 3
    log2_ctb: int = 6
    log2_min_tb: int = 2
    log2_max_tb: int = 5
    max_transform_hierarchy_depth_inter: int = 0
    max_transform_hierarchy_depth_intra: int = 0
    scaling_list_enabled: int = 0
    amp_enabled: int = 0
    sao_enabled: int = 0
    pcm_enabled: int = 0
    short_term_rps: tuple = ()
    long_term_ref_pics_present: int = 0
    temporal_mvp_enabled: int = 0
    strong_intra_smoothing: int = 0
    ptl: ProfileTierLevel = dataclasses.field(default_factory=ProfileTierLevel)


@dataclasses.dataclass
class Pps:
    id: int = 0
    sps_id: int = 0
    dependent_slice_segments_enabled: int = 0
    output_flag_present: int = 0
    sign_data_hiding: int = 0
    cabac_init_present: int = 0
    num_ref_idx_l0_default: int = 1
    num_ref_idx_l1_default: int = 1
    init_qp: int = 26
    constrained_intra_pred: int = 0
    transform_skip_enabled: int = 0
    cu_qp_delta_enabled: int = 0
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    slice_chroma_qp_offsets_present: int = 0
    weighted_pred: int = 0
    weighted_bipred: int = 0
    transquant_bypass_enabled: int = 0
    tiles_enabled: int = 0
    entropy_coding_sync_enabled: int = 0
    loop_filter_across_slices: int = 0
    deblocking_filter_control_present: int = 0
    deblocking_filter_override_enabled: int = 0
    deblocking_filter_disabled: int = 0
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    lists_modification_present: int = 0
    log2_parallel_merge_level: int = 2


def _profile_tier_level(r: BitReader, max_sub_layers_minus1: int):
    """profile_tier_level (h265.cpp:242-256)."""
    ptl = ProfileTierLevel()
    ptl.profile_first8 = r.get_bits(8)
    ptl.compat_flags = r.get_bits(32)
    ptl.second48 = bytes(r.get_bits(8) for _ in range(6))
    ptl.level_idc = r.get_bits(8)
    if max_sub_layers_minus1:
        present = r.get_bits(16)
        p = present
        for _ in range(max_sub_layers_minus1):
            if p & 0x8000:
                r.get_bits(8)
                r.get_bits(32)
                for _ in range(6):
                    r.get_bits(8)
            if p & 0x4000:
                r.get_bits(8)
            p = (p << 2) & 0xFFFF
    return ptl


def _st_rps_nopred(r: BitReader) -> StRefPicSet:
    """short_term_ref_pic_set_nopred (h265.cpp:392-421)."""
    s = StRefPicSet()
    n_neg = r.ue()
    n_pos = r.ue()
    val = 0
    neg, used_neg, cnt = [], 0, 0
    for i in range(n_neg):
        val -= r.ue() + 1
        neg.append(val)
        b = r.get_onebit()
        used_neg |= b << i
        cnt += b
    val = 0
    pos, used_pos = [], 0
    for i in range(n_pos):
        val += r.ue() + 1
        pos.append(val)
        b = r.get_onebit()
        used_pos |= b << i
        cnt += b
    s.neg, s.pos = tuple(neg), tuple(pos)
    s.used_neg, s.used_pos = used_neg, used_pos
    s.total_curr = cnt
    return s


def _st_rps_pred(r: BitReader, ref: StRefPicSet) -> StRefPicSet:
    """short_term_ref_pic_set_pred (h265.cpp:423-470): derive this RPS
    from the previous one via delta_rps + per-entry use flags."""
    sign = r.get_onebit()
    delta_rps = (r.ue() + 1) * (-1 if sign else 1)
    n_ref = len(ref.neg) + len(ref.pos)
    used_flag = 0
    use_delta = 0
    used_cnt = 0
    for j in range(n_ref + 1):
        bit = 1 << j
        if r.get_onebit():
            used_flag |= bit
            use_delta |= bit
            used_cnt += 1
        elif r.get_onebit():
            use_delta |= bit
    # ref delta list in flag order: neg[0..], pos[0..], then delta_rps
    ref_all = list(ref.neg) + list(ref.pos)
    out = StRefPicSet()
    for s0 in (0, 1):  # 0 = negative side, 1 = positive side
        lst, used = [], 0
        src = (list(ref.pos)[::-1] if s0 == 0 else list(ref.neg)[::-1])
        # iterate opposite-sign refs (farthest first) then same-sign
        seq = []
        if s0 == 0:
            for j in range(len(ref.pos) - 1, -1, -1):
                seq.append((ref.pos[j], len(ref.neg) + j))
        else:
            for j in range(len(ref.neg) - 1, -1, -1):
                seq.append((ref.neg[j], j))
        for dp, j in seq:
            v = dp + delta_rps
            if (v < 0 if s0 == 0 else v > 0) and (use_delta & (1 << j)):
                used |= (1 if used_flag & (1 << j) else 0) << len(lst)
                lst.append(v)
        if ((delta_rps < 0 if s0 == 0 else delta_rps > 0)
                and (use_delta & (1 << n_ref))):
            used |= (1 if used_flag & (1 << n_ref) else 0) << len(lst)
            lst.append(delta_rps)
        if s0 == 0:
            for j, dp in enumerate(ref.neg):
                v = dp + delta_rps
                if v < 0 and (use_delta & (1 << j)):
                    used |= (1 if used_flag & (1 << j) else 0) << len(lst)
                    lst.append(v)
            out.neg, out.used_neg = tuple(lst), used
        else:
            for j, dp in enumerate(ref.pos):
                v = dp + delta_rps
                if v > 0 and (use_delta & (1 << (len(ref.neg) + j))):
                    used |= (1 if used_flag
                             & (1 << (len(ref.neg) + j)) else 0) << len(lst)
                    lst.append(v)
            out.pos, out.used_pos = tuple(lst), used
    out.total_curr = used_cnt
    return out


def parse_vps(r: BitReader) -> Vps:
    """video_parameter_set (h265.cpp:283-304)."""
    v = Vps()
    v.id = r.get_bits(4)
    r.get_bits(2)
    v.max_layer = r.get_bits(6)
    msl = r.get_bits(3)
    v.max_sub_layers = msl + 1
    v.temporal_id_nesting_flag = r.get_onebit()
    r.get_bits(16)
    v.ptl = _profile_tier_level(r, msl)
    info_present = r.get_onebit()
    for _ in range((0 if info_present else msl), msl + 1):
        r.ue()
        r.ue()
        r.ue()
    r.get_bits(6)  # max_layer_id
    for _ in range(r.ue()):
        pass  # layer-set bits skipped with max_layer_id+1 each (unused)
    if r.get_onebit():  # timing info
        r.get_bits(32)
        r.get_bits(32)
        if r.get_onebit():
            r.ue()
        r.ue()
    return v


def parse_sps(r: BitReader) -> Sps:
    """seq_parameter_set (h265.cpp:498-625 shape)."""
    s = Sps()
    s.vps_id = r.get_bits(4)
    msl = r.get_bits(3)
    r.get_onebit()  # temporal_id_nesting
    s.ptl = _profile_tier_level(r, msl)
    s.id = r.ue()
    s.chroma_format_idc = r.ue()
    if s.chroma_format_idc == 3:
        r.get_onebit()
    s.pic_width = r.ue()
    s.pic_height = r.ue()
    if r.get_onebit():  # conformance window
        s.cropping = tuple(r.ue() for _ in range(4))
    s.bit_depth_luma = r.ue() + 8
    s.bit_depth_chroma = r.ue() + 8
    s.log2_max_poc_lsb = r.ue() + 4
    info_present = r.get_onebit()
    bufs = []
    for _ in range((0 if info_present else msl), msl + 1):
        bufs.append((r.ue(), r.ue(), r.ue()))
    s.max_dec_pic_buffering = tuple(bufs)
    s.log2_min_cb = r.ue() + 3
    s.log2_ctb = s.log2_min_cb + r.ue()
    s.log2_min_tb = r.ue() + 2
    s.log2_max_tb = s.log2_min_tb + r.ue()
    s.max_transform_hierarchy_depth_inter = r.ue()
    s.max_transform_hierarchy_depth_intra = r.ue()
    s.scaling_list_enabled = r.get_onebit()
    if s.scaling_list_enabled:
        raise NotImplementedError("SPS scaling lists (reference parity)")
    s.amp_enabled = r.get_onebit()
    s.sao_enabled = r.get_onebit()
    s.pcm_enabled = r.get_onebit()
    if s.pcm_enabled:
        raise NotImplementedError("PCM")
    n_rps = r.ue()
    rps = []
    for i in range(n_rps):
        if i and r.get_onebit():
            rps.append(_st_rps_pred(r, rps[-1]))
        else:
            rps.append(_st_rps_nopred(r))
    s.short_term_rps = tuple(rps)
    s.long_term_ref_pics_present = r.get_onebit()
    if s.long_term_ref_pics_present:
        raise NotImplementedError("long-term ref pics")
    s.temporal_mvp_enabled = r.get_onebit()
    s.strong_intra_smoothing = r.get_onebit()
    # vui / extensions ignored
    return s


def parse_pps(r: BitReader) -> Pps:
    """pic_parameter_set (h265.cpp:627-720 shape)."""
    p = Pps()
    p.id = r.ue()
    p.sps_id = r.ue()
    p.dependent_slice_segments_enabled = r.get_onebit()
    p.output_flag_present = r.get_onebit()
    r.get_bits(3)  # num_extra_slice_header_bits
    p.sign_data_hiding = r.get_onebit()
    p.cabac_init_present = r.get_onebit()
    p.num_ref_idx_l0_default = r.ue() + 1
    p.num_ref_idx_l1_default = r.ue() + 1
    p.init_qp = r.se() + 26
    p.constrained_intra_pred = r.get_onebit()
    p.transform_skip_enabled = r.get_onebit()
    p.cu_qp_delta_enabled = r.get_onebit()
    if p.cu_qp_delta_enabled:
        p.diff_cu_qp_delta_depth = r.ue()
    p.cb_qp_offset = r.se()
    p.cr_qp_offset = r.se()
    p.slice_chroma_qp_offsets_present = r.get_onebit()
    p.weighted_pred = r.get_onebit()
    p.weighted_bipred = r.get_onebit()
    p.transquant_bypass_enabled = r.get_onebit()
    p.tiles_enabled = r.get_onebit()
    p.entropy_coding_sync_enabled = r.get_onebit()
    if p.tiles_enabled:
        raise NotImplementedError("tiles (decoded sequentially by the "
                                  "reference; parse TBD)")
    p.loop_filter_across_slices = r.get_onebit()
    p.deblocking_filter_control_present = r.get_onebit()
    if p.deblocking_filter_control_present:
        p.deblocking_filter_override_enabled = r.get_onebit()
        p.deblocking_filter_disabled = r.get_onebit()
        if not p.deblocking_filter_disabled:
            p.beta_offset_div2 = r.se()
            p.tc_offset_div2 = r.se()
    if r.get_onebit():  # pps_scaling_list_data_present
        raise NotImplementedError("PPS scaling lists")
    p.lists_modification_present = r.get_onebit()
    p.log2_parallel_merge_level = r.ue() + 2
    return p


class H265Decoder:
    """NAL walker + parameter-set state (h265d_data_t equivalent).

    decode_picture raises NotImplementedError until the CTU phases land.
    """

    def __init__(self):
        self.vps = None
        self.sps_store = {}
        self.pps_store = {}

    def set_data(self, data: bytes):
        self.data = bytes(data)
        self.offs = find_start_codes(self.data)

    def parse_headers(self):
        """Walk NALs and ingest VPS/SPS/PPS; returns parsed-type list."""
        seen = []
        for k, off in enumerate(self.offs):
            start = int(off) + 3
            end = int(self.offs[k + 1]) if k + 1 < len(self.offs) \
                else len(self.data)
            nal_type = (self.data[start] >> 1) & 0x3F
            payload = unescape_nal(self.data[start + 2 : end])
            r = BitReader(payload)
            if nal_type == NAL_VPS:
                self.vps = parse_vps(r)
            elif nal_type == NAL_SPS:
                s = parse_sps(r)
                self.sps_store[s.id] = s
            elif nal_type == NAL_PPS:
                p = parse_pps(r)
                self.pps_store[p.id] = p
            seen.append(nal_type)
        return seen

    def decode_all(self):
        raise NotImplementedError(
            "H.265 CTU decode: CABAC entropy + quad-tree reconstruction "
            "is the next build phase (SURVEY.md §2.1 H.265 row)")
