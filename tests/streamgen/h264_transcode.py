"""CAVLC -> CABAC transcoder (test-stream tooling).

Decodes a CAVLC stream with m2dec_tpu's decoder while re-encoding every
syntax element into CABAC, using the decoder's own neighbor state for the
context increments (the decoder exposes emit hooks via ``dec.tc``). The
result is a CABAC stream with identical reconstruction, giving the CABAC
path full P/B/skip/direct coverage from the proven CAVLC generators.
"""

from __future__ import annotations

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from m2dec_tpu.bitstream import BitWriter  # noqa: E402
from m2dec_tpu.bitstream.writer import escape_nal  # noqa: E402
from m2dec_tpu.bitstream.reader import find_start_codes  # noqa: E402
from m2dec_tpu.codecs.h264 import cabac as AE  # noqa: E402
from m2dec_tpu.codecs.h264.cavlc import COEFF_OFS, _ZIGZAG  # noqa: E402
from m2dec_tpu.codecs.h264.decoder import H264Decoder  # noqa: E402

from .h264_enc import CabacEncoder  # noqa: E402

I_SLICE, P_SLICE, B_SLICE = 2, 0, 1
MB_INxN, MB_IPCM = 0, 25
_DCMASK = {0: 0, 1: 15, 2: 15, 3: 0, 4: 15, 5: 63}


class CabacTranscoder:
    """dec.tc sink: mirrors the CABAC readers with a CabacEncoder."""

    def __init__(self, rng):
        self.rng = rng
        self.slices = []  # (nal_header_byte, payload_bytes)
        self.w = None
        self.enc = None
        self.force_zero_refs = False

    # ----------------------------------------------------------- slice --
    def begin_slice(self, dec):
        hdr, pps, sps = dec.hdr, dec.pps, dec.sps
        w = BitWriter()
        w.ue(hdr.first_mb_in_slice)
        w.ue(hdr.slice_type + 5)
        w.ue(hdr.pps_id)
        w.put_bits(hdr.frame_num, sps.log2_max_frame_num)
        is_idr = (dec.nal_id & 31) == 5
        if is_idr:
            w.ue(hdr.idr_pic_id)
        w.put_bits(hdr.poc_lsb, sps.log2_max_poc_lsb)
        if hdr.slice_type == B_SLICE:
            w.put_bits(hdr.direct_spatial_mv_pred_flag, 1)
        if hdr.slice_type in (P_SLICE, B_SLICE):
            w.put_bits(0, 1)  # num_ref_idx_active_override (gens never set)
            w.put_bits(0, 1)  # ref_pic_list_reordering_l0
            if hdr.slice_type == B_SLICE:
                w.put_bits(0, 1)  # ref_pic_list_reordering_l1
        if dec.nal_id & 0x60:
            if is_idr:
                w.put_bits(0, 1)  # no_output_of_prior_pics
                w.put_bits(hdr.long_term_reference_flag, 1)
            else:
                w.put_bits(0, 1)  # adaptive_ref_pic_marking (gens never)
        idc = 0
        if hdr.slice_type != I_SLICE:
            idc = self.rng.randrange(3)
            w.ue(idc)  # cabac_init_idc
        w.se(hdr.qp_delta)
        if pps.deblocking_filter_control_present_flag:
            w.ue(hdr.disable_deblocking_filter_idc)
            if hdr.disable_deblocking_filter_idc != 1:
                w.se(hdr.alpha_c0_offset // 2)
                w.se(hdr.beta_offset // 2)
        w.byte_align(1)  # cabac_alignment_one_bit
        self.w = w
        ctx_idc = 0 if hdr.slice_type == I_SLICE else idc + 1
        self.enc = CabacEncoder(w, dec.qp, ctx_idc)
        self.nal_byte = dec.nal_id

    def mb_done(self, dec, ret):
        self.enc.terminate(1 if ret < 0 else 0)
        if ret < 0:
            self.w.byte_align(0)
            self.slices.append((self.nal_byte, self.w.tobytes()))
            self.w = self.enc = None

    # --------------------------------------------------------- elements --
    def emit_skip_flag(self, dec, flag):
        avail = dec._avail()
        ofs = 11 if dec.hdr.slice_type == P_SLICE else 24
        if (avail & 1) and dec.mbleft.mb_skip == 0:
            ofs += 1
        if (avail & 2) and dec._top().mb_skip == 0:
            ofs += 1
        self.enc.decision(ofs, flag)

    def _enc_mb_type_intra(self, v, base, is_i, prefix_ctx):
        enc = self.enc
        if v == MB_INxN:
            enc.decision(prefix_ctx, 0)
            return
        enc.decision(prefix_ctx, 1)
        enc.terminate(1 if v == MB_IPCM else 0)
        if v == MB_IPCM:
            return
        a, rem = divmod(v - 1, 12)
        enc.decision(base + 1, a)
        if rem < 4:
            enc.decision(base + 2, 0)
        else:
            enc.decision(base + 2, 1)
            rem -= 4
            enc.decision(base + 2 + is_i, rem >> 2)
            rem &= 3
        enc.decision(base + 3 + is_i, rem >> 1)
        enc.decision(base + 3 + 2 * is_i, rem & 1)

    def emit_mb_type(self, dec, mbtype, avail):
        enc = self.enc
        st = dec.hdr.slice_type
        self.force_zero_refs = False
        if st == I_SLICE:
            add = (int(bool(avail & 2) and dec._top().type != MB_INxN)
                   + int(bool(avail & 1) and dec.mbleft.type != MB_INxN))
            self._enc_mb_type_intra(mbtype, 5, 1, 3 + add)
            return
        if st == P_SLICE:
            if mbtype < 26:  # intra in P
                enc.decision(14, 1)
                self._enc_mb_type_intra(mbtype, 17, 0, 17)
                return
            enc.decision(14, 0)
            raw = mbtype - 26  # 0=16x16 1=16x8 2=8x16 3=8x8 4=8x8ref0
            if raw == 4:
                # P8x8REF0 has no CABAC mb_type; re-encode as P8x8 with
                # explicit zero refs (identical reconstruction)
                raw = 3
                self.force_zero_refs = True
            if raw in (1, 2):
                enc.decision(15, 1)
                enc.decision(17, 1 if raw == 1 else 0)
            else:
                enc.decision(15, 0)
                enc.decision(16, 1 if raw == 3 else 0)
            return
        # B slice (mb_type_cabac_B inverse)
        add = (int(bool(avail & 1) and dec.mbleft.type != 31)
               + int(bool(avail & 2) and dec._top().type != 31))
        if mbtype == 31:  # BDirect16x16
            enc.decision(27 + add, 0)
            return
        enc.decision(27 + add, 1)
        if mbtype in (32, 33):  # raw 1,2: L0/L1 16x16
            enc.decision(30, 0)
            enc.decision(32, mbtype - 32)
            return
        enc.decision(30, 1)
        extra = None
        if mbtype < 26:  # intra in B
            mode = 13
        else:
            raw = mbtype - 31  # raw mb_type 3..22
            if 3 <= raw <= 10:
                mode = raw - 3
            elif raw == 11:
                mode = 14
            elif raw == 22:
                mode = 15
            else:  # raw 12..21: mode 8..12 plus one extra bin
                mode = (raw + 4) // 2
                extra = (raw + 4) % 2
        enc.decision(31, (mode >> 3) & 1)
        enc.decision(32, (mode >> 2) & 1)
        enc.decision(32, (mode >> 1) & 1)
        enc.decision(32, mode & 1)
        if mbtype < 26:
            self._enc_mb_type_intra(mbtype, 32, 0, 32)
        elif extra is not None:
            enc.decision(32, extra)

    def emit_pcm(self, dec, pcm_bytes):
        enc, w = self.enc, self.w
        pcm_start = (enc.dec_consumed + 7) & ~7
        if pcm_start <= w.nbits:
            w.truncate_to_bits(pcm_start)
        else:
            w.put_bits((1 << (pcm_start - w.nbits)) - 1,
                       pcm_start - w.nbits)
        for b in pcm_bytes:
            w.put_bits(b, 8)
        enc.reinit_engine()

    def emit_transform_flag(self, dec, v, avail):
        tp, lf = dec._top(), dec.mbleft
        ofs = 399 + (int(bool(avail & 2) and tp.transform8x8 != 0)
                     + int(bool(avail & 1) and lf.transform8x8 != 0))
        self.enc.decision(ofs, v)

    def emit_i4x4_mode(self, dec, pa, pb, mode):
        enc = self.enc
        pred = min(pa, pb)
        if mode == pred:
            enc.decision(68, 1)
        else:
            rem = mode if mode < pred else mode - 1
            enc.decision(68, 0)
            enc.decision(69, rem & 1)
            enc.decision(69, (rem >> 1) & 1)
            enc.decision(69, (rem >> 2) & 1)

    def emit_chroma_mode(self, dec, mode, avail):
        enc = self.enc
        tp, lf = dec._top(), dec.mbleft
        idx = 64 + (int(bool(avail & 2) and tp.type < MB_IPCM
                        and tp.chroma_pred_mode != 0)
                    + int(bool(avail & 1) and lf.type < MB_IPCM
                          and lf.chroma_pred_mode != 0))
        enc.decision(idx, 1 if mode else 0)
        if mode:
            for _ in range(mode - 1):
                enc.decision(67, 1)
            if mode < 3:
                enc.decision(67, 0)

    def emit_cbp(self, dec, cbp, avail):
        enc = self.enc
        cbp_a = dec.mbleft.cbp if avail & 1 else 0x0F
        cbp_b = dec._top().cbp if avail & 2 else 0x0F
        inc = (not (cbp_a & 2)) + (not (cbp_b & 4)) * 2
        enc.decision(73 + inc, cbp & 1)
        inc = (not (cbp & 1)) + (not (cbp_b & 8)) * 2
        enc.decision(73 + inc, (cbp >> 1) & 1)
        inc = (not (cbp_a & 8)) + (not (cbp & 1)) * 2
        enc.decision(73 + inc, (cbp >> 2) & 1)
        inc = (not (cbp & 4)) + (not (cbp & 2)) * 2
        enc.decision(73 + inc, (cbp >> 3) & 1)
        ca, cb = cbp_a >> 4, cbp_b >> 4
        inc = (ca != 0) + (cb != 0) * 2
        cc = cbp >> 4
        enc.decision(77 + inc, 1 if cc else 0)
        if cc:
            inc = (ca >> 1) + (cb & 2)
            enc.decision(77 + 4 + inc, cc - 1)

    def emit_qp_delta(self, dec, delta):
        enc = self.enc
        idx = 60 + (dec.prev_qp_delta != 0)
        if delta == 0:
            enc.decision(idx, 0)
            return
        enc.decision(idx, 1)
        code = 2 * delta - 1 if delta > 0 else -2 * delta
        for k in range(code - 1):
            enc.decision(62 if k == 0 else 63, 1)
        enc.decision(62 if code == 1 else 63, 0)

    def emit_mvd_xy(self, dec, dx, dy, mvd_a, mvd_b):
        self._emit_mvd(40, dx, int(mvd_a[0]), int(mvd_b[0]))
        self._emit_mvd(47, dy, int(mvd_a[1]), int(mvd_b[1]))

    def _emit_mvd(self, base, v, mva, mvb):
        enc = self.enc
        s = abs(mva) + abs(mvb)
        inc = 0 if s < 3 else (1 if s <= 32 else 2)
        if v == 0:
            enc.decision(base + inc, 0)
            return
        enc.decision(base + inc, 1)
        a = abs(v)
        cnt = 1
        idx = base + 3
        while cnt < a and cnt < 9:
            enc.decision(idx, 1)
            idx += 1 if cnt < 4 else 0
            cnt += 1
        if a < 9:
            enc.decision(idx, 0)
        else:
            rem = a - 9
            exp = 3
            while rem >= (1 << exp):
                enc.bypass(1)
                rem -= 1 << exp
                exp += 1
                assert exp < 16, "mvd beyond UEG3 guard"
            enc.bypass(0)
            for k in range(exp - 1, -1, -1):
                enc.bypass((rem >> k) & 1)
        enc.bypass(1 if v < 0 else 0)

    def emit_ref(self, dec, v, inc):
        enc = self.enc
        for _ in range(v):
            enc.decision(54 + inc, 1)
            inc = (inc >> 2) + 4
        enc.decision(54 + inc, 0)

    def emit_sub_types_p(self, dec, sub_mb_type):
        enc = self.enc
        for t in sub_mb_type:
            if t == 0:
                enc.decision(21, 1)
            elif t == 1:
                enc.decision(21, 0)
                enc.decision(22, 0)
            elif t == 2:
                enc.decision(21, 0)
                enc.decision(22, 1)
                enc.decision(23, 1)
            else:
                enc.decision(21, 0)
                enc.decision(22, 1)
                enc.decision(23, 0)
        if self.force_zero_refs and dec.hdr.num_ref_idx_active[0]:
            # P8x8REF0 re-encoded as P8x8: explicit zero refs for the 4
            # blocks; ctx incs collapse (all refs are 0, sub_dirs all L0)
            avail = dec._avail_saved
            l, tp = dec.mbleft, dec._top()
            incs = [
                int(bool(avail & 1) and not (l.direct8x8 & 1)
                    and l.ref[0][0] > 0)
                + int(bool(avail & 2) and not (tp.direct8x8 & 1)
                      and tp.ref[0][0] > 0) * 2,
                int(bool(avail & 2) and not (tp.direct8x8 & 2)
                    and tp.ref[1][0] > 0) * 2,
                int(bool(avail & 1) and not (l.direct8x8 & 2)
                    and l.ref[1][0] > 0),
                0,
            ]
            for inc in incs:
                self.emit_ref(dec, 0, inc)

    def emit_sub_type_b(self, dec, t):
        enc = self.enc
        if t == 0:
            enc.decision(36, 0)
            return
        enc.decision(36, 1)
        if t in (1, 2):
            enc.decision(37, 0)
            enc.decision(39, t - 1)
            return
        enc.decision(37, 1)
        if t in (11, 12):
            enc.decision(38, 1)
            enc.decision(39, 1)
            enc.decision(39, t - 11)
            return
        if 7 <= t <= 10:
            enc.decision(38, 1)
            enc.decision(39, 0)
            base = 7
        else:  # 3..6
            enc.decision(38, 0)
            base = 3
        d = t - base
        enc.decision(39, d >> 1)
        enc.decision(39, d & 1)

    def emit_residual(self, dec, coeff, qmat, cat, pos4x4, avail, cnum):
        enc = self.enc
        ofs, num_coeff, _ = COEFF_OFS[cat]
        dc_mask = _DCMASK[cat]
        zigzag = _ZIGZAG[cat]
        coefs = []
        if cnum:  # total_coeff==0 leaves `coeff` stale (cavlc early-out)
            for p in range(num_coeff):
                zi = zigzag[p + ofs]
                v = int(coeff[zi])
                if v:
                    q = int(qmat[zi & dc_mask])
                    coefs.append((p, v // q))
        if cat != 5:
            inc = AE._CTXIDXINC_CBF[pos4x4](dec, dec.cbf, avail)
            if not coefs:
                enc.decision(85 + inc + cat * 4, 0)
                return
            enc.decision(85 + inc + cat * 4, 1)
        sig_ofs, last_ofs = AE.CT.SIG_OFS[cat]
        latter = AE.CT.SIG64 if cat == 5 else AE.CT.SIG16
        posset = {p for p, _ in coefs}
        lastpos = max(posset)
        for i in range(num_coeff - 1):
            if i > lastpos:
                break
            sig = i in posset
            enc.decision(sig_ofs + latter[i][1], 1 if sig else 0)
            if sig:
                enc.decision(last_ofs + latter[i][0],
                             1 if i == lastpos else 0)
        node = 0
        abs_base = 227 + AE.CT.ABS_LEVEL_OFS[cat]
        for p, lv in reversed(coefs):
            a = abs(lv)
            if a == 1:
                enc.decision(abs_base + AE.CT.COEFF_ABS_LEVEL_CTX[0][node], 0)
                node = AE.CT.COEFF_ABS_LEVEL_TRANS[0][node]
            else:
                enc.decision(abs_base + AE.CT.COEFF_ABS_LEVEL_CTX[0][node], 1)
                idx = abs_base + AE.CT.COEFF_ABS_LEVEL_CTX[1][node]
                node = AE.CT.COEFF_ABS_LEVEL_TRANS[1][node]
                for _ in range(min(a, 15) - 2):
                    enc.decision(idx, 1)
                if a < 15:
                    enc.decision(idx, 0)
                else:
                    vv = a - 15
                    ln = 0
                    while (1 << (ln + 1)) - 1 <= vv:
                        ln += 1
                    for _ in range(ln):
                        enc.bypass(1)
                    enc.bypass(0)
                    rem = vv - ((1 << ln) - 1)
                    for k in range(ln - 1, -1, -1):
                        enc.bypass((rem >> k) & 1)
            enc.bypass(1 if lv < 0 else 0)


def _write_pps(pps):
    w = BitWriter()
    w.ue(0)
    w.ue(pps.seq_parameter_set_id)
    w.put_bits(1, 1)  # entropy: CABAC
    w.put_bits(pps.pic_order_present_flag, 1)
    w.ue(0)  # num_slice_groups-1
    w.ue(pps.num_ref_idx_l0_active_minus1)
    w.ue(pps.num_ref_idx_l1_active_minus1)
    w.put_bits(pps.weighted_pred_flag, 1)
    w.put_bits(pps.weighted_bipred_idc, 2)
    w.se(pps.pic_init_qp - 26)
    w.se(pps.pic_init_qs - 26)
    w.se(pps.chroma_qp_index[0])
    w.put_bits(pps.deblocking_filter_control_present_flag, 1)
    w.put_bits(pps.constrained_intra_pred_flag, 1)
    w.put_bits(0, 1)  # redundant_pic_cnt_present
    if pps.transform_8x8_mode_flag or pps.chroma_qp_index[0] != pps.chroma_qp_index[1]:
        w.put_bits(pps.transform_8x8_mode_flag, 1)
        w.put_bits(0, 1)  # pic_scaling_matrix_present
        w.se(pps.chroma_qp_index[1])
    w.rbsp_trailing_bits()
    return w.tobytes()


def transcode_to_cabac(data, rng):
    """Return a CABAC stream reconstructing identically to `data`."""
    dec = H264Decoder()
    tc = CabacTranscoder(rng)
    dec.tc = tc
    dec.set_data(data)
    dec.decode_all()
    # reassemble: SPS copied, PPS rebuilt with entropy=1, slices replaced
    out = bytearray()
    offs = find_start_codes(data)
    si = 0
    for k, off in enumerate(offs):
        start = int(off) + 3
        end = int(offs[k + 1]) if k + 1 < len(offs) else len(data)
        nal_byte = data[start]
        t = nal_byte & 31
        if t == 7:
            out += data[int(off):end]
        elif t == 8:
            out += b"\x00\x00\x01"
            out.append(nal_byte)
            out += escape_nal(_write_pps(dec.pps_store[0]))
        elif t in (1, 5):
            hb, payload = tc.slices[si]
            si += 1
            out += b"\x00\x00\x01"
            out.append(hb)
            out += escape_nal(payload)
    assert si == len(tc.slices), (si, len(tc.slices))
    return bytes(out)
