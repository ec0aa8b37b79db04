"""Randomized MPEG-1/2 syntax-stream generator for decoder conformance tests.

There is no encoder in the reference and no conformance-stream corpus in
this environment, so tests generate random-but-valid elementary streams:
every syntax element is drawn from its legal set (macroblock types, skips,
quant updates, motion vectors kept inside the frame, VLC-or-escape
coefficient coding, ...), and the *reference decoder binary* defines the
golden output. This gives far broader decoder coverage than any single
real-world stream (it is the `txt2bin` fixture idea of the reference —
src/lib/txt2bin.c — scaled up to whole streams).

The generator mirrors the decoder-side predictor state machines (DC
predictors, PMVs, reset rules of mpeg2.cpp:872-896) so emitted deltas are
always consistent.
"""

from __future__ import annotations

import random

import numpy as np

from m2dec_tpu.bitstream import BitWriter
from m2dec_tpu.codecs.mpeg2 import tables as T
from m2dec_tpu.kernels.mpeg2_idct import idct8x8

# The reference's ClipStore/AddStore clip through a 1024-entry LUT biased by
# 256 (m2d.cpp:157,289; m2d_macro.h:100) — defined only for operands in
# [-256, 767]. Real encoders never exceed it; the generator must bound each
# block's IDCT output accordingly or the reference exhibits UB.
INTRA_IDCT_RANGE = (-256, 767)
INTER_IDCT_RANGE = (-256, 512)  # dst in [0,255] keeps dst+val in domain

I, P, B = 1, 2, 3

ENC_MB_INC = T.invert(T.MB_INC)
ENC_MB_TYPE = (T.invert(T.MB_TYPE_I), T.invert(T.MB_TYPE_P), T.invert(T.MB_TYPE_B))
ENC_CBP = T.invert(T.CBP)
ENC_MOTION = T.invert(T.MOTION_CODE)
ENC_DC_SIZE = (T.invert(T.DCT_DC_SIZE_LUMA), T.invert(T.DCT_DC_SIZE_CHROMA))
ENC_DCT = (T.invert(T.DCT_TABLE0), T.invert(T.DCT_TABLE1))

MB_FORWARD, MB_BACKWARD, MB_INTRA, MB_PATTERN, MB_QUANT = 1, 2, 4, 8, 16
MB_MC = MB_FORWARD | MB_BACKWARD


class Mpeg2StreamGen:
    def __init__(self, width, height, seed=0, mpeg1=False, f_code=2,
                 intra_vlc_format=None, q_scale_type=None, alternate_scan=None,
                 custom_qmat=False, intra_dc_precision=None, closed_gop=True):
        self.w = width
        self.h = height
        self.mb_w = (width + 15) >> 4
        self.mb_h = (height + 15) >> 4
        self.rng = random.Random(seed)
        self.mpeg1 = mpeg1
        self.f_code = f_code  # used for all MV dimensions
        self.opt_ivf = intra_vlc_format
        self.opt_qst = q_scale_type
        self.opt_alt = alternate_scan
        self.custom_qmat = custom_qmat
        self.opt_dcp = intra_dc_precision
        self.closed_gop = closed_gop
        self.w_bits = BitWriter()

    # ------------------------------------------------------------------
    def generate(self, pattern="IPPBP"):
        """Emit a stream with the given picture-type pattern (coding order).

        temporal_reference is assigned so that display order is standard:
        B pictures precede their backward reference in display order.
        """
        w = self.w_bits = BitWriter()
        self._seq_header()
        if not self.mpeg1:
            self._seq_extension()
        self._gop_header()
        # temporal_reference follows display order: an I/P picture's value
        # jumps ahead of the B pictures that follow it in coding order
        order = self._display_order(pattern)
        for idx, c in enumerate(pattern):
            ct = {"I": I, "P": P, "B": B}[c]
            self._picture(ct, order[idx] & 1023, first=(idx == 0))
        self._put_start(0xB7)  # sequence_end_code
        return w.tobytes()

    @staticmethod
    def _count_bs_after(pattern, idx):
        n = 0
        for c in pattern[idx + 1:]:
            if c == "B":
                n += 1
            else:
                break
        return n

    @staticmethod
    def _display_order(pattern):
        order = [None] * len(pattern)
        di = 0
        i = 0
        while i < len(pattern):
            c = pattern[i]
            if c in "IP":
                nb = Mpeg2StreamGen._count_bs_after(pattern, i)
                order[i] = di + nb
                for k in range(nb):
                    order[i + 1 + k] = di + k
                di += nb + 1
                i += 1 + nb
            else:
                # leading B (open GOP): give it the next display slot
                order[i] = di
                di += 1
                i += 1
        return order

    # -- bit helpers -----------------------------------------------------
    def _put_start(self, code):
        self.w_bits.byte_align(0)
        self.w_bits.put_bits(0x000001, 24).put_bits(code, 8)

    def _vlc(self, enc, key):
        self.w_bits.put_bitstring(enc[key])

    # -- headers ---------------------------------------------------------
    def _seq_header(self):
        w = self.w_bits
        self._put_start(0xB3)
        w.put_bits(self.w, 12).put_bits(self.h, 12)
        w.put_bits(2, 4)  # aspect 4:3
        w.put_bits(3, 4)  # 25 fps
        w.put_bits(12500, 18)
        w.put_bits(1, 1)  # marker
        w.put_bits(112, 10)  # vbv
        w.put_bits(0, 1)  # constrained
        self.qmat_intra = list(T.QMAT_INTRA_DEFAULT)
        self.qmat_nonintra = [16] * 64
        if self.custom_qmat:
            rng = self.rng
            zz = T.SCAN[0]
            w.put_bits(1, 1)
            vals = [rng.randrange(1, 256) for _ in range(64)]
            for i in range(64):
                w.put_bits(vals[i], 8)
                self.qmat_intra[zz[i]] = vals[i]
            w.put_bits(1, 1)
            vals = [rng.randrange(1, 256) for _ in range(64)]
            for i in range(64):
                w.put_bits(vals[i], 8)
                self.qmat_nonintra[zz[i]] = vals[i]
        else:
            w.put_bits(0, 1).put_bits(0, 1)

    def _seq_extension(self):
        w = self.w_bits
        self._put_start(0xB5)
        w.put_bits(1, 4)  # sequence extension id
        w.put_bits(0x48, 8)  # profile/level: Main@Main
        w.put_bits(1, 1)  # progressive_sequence
        w.put_bits(1, 2)  # chroma 4:2:0
        w.put_bits(0, 2).put_bits(0, 2)  # size ext
        w.put_bits(0, 12)  # bitrate ext
        w.put_bits(1, 1)  # marker
        w.put_bits(0, 8)  # vbv ext
        w.put_bits(0, 1)  # low_delay
        w.put_bits(0, 2).put_bits(0, 5)  # frame rate ext

    def _gop_header(self):
        w = self.w_bits
        self._put_start(0xB8)
        w.put_bits(0, 25)  # time code
        w.put_bits(1 if self.closed_gop else 0, 1)
        w.put_bits(0, 1)  # broken link

    # -- picture ---------------------------------------------------------
    def _picture(self, ct, temporal_reference, first):
        rng = self.rng
        w = self.w_bits
        self.ct = ct
        self._put_start(0x00)
        w.put_bits(temporal_reference, 10)
        w.put_bits(ct, 3)
        w.put_bits(0xFFFF, 16)  # vbv_delay
        if ct in (P, B):
            # MPEG-1 full_pel(=0) + f_code; for MPEG-2 the reference reads
            # these 4 bits too but the coding extension overrides them
            w.put_bits(self.f_code if self.mpeg1 else 0xF, 4)
            if ct == B:
                w.put_bits(self.f_code if self.mpeg1 else 0xF, 4)
        w.put_bits(0, 1)  # extra_bit_picture

        self.dc_precision = 0
        self.q_scale_type = 0
        self.intra_vlc_format = 0
        self.alternate_scan = 0
        if not self.mpeg1:
            self._picture_coding_extension(ct)
        self.scan = T.SCAN[self.alternate_scan]
        self.dc_scale = 3 - self.dc_precision
        self.dc_max = (1 << (self.dc_precision + 8)) - 1
        self.qmap = T.Q_SCALE[self.q_scale_type]

        # per-picture predictor mirrors
        self.r_size = self.f_code - 1 if not self.mpeg1 else self.f_code - 1
        self._slices(ct)

    def _picture_coding_extension(self, ct):
        rng = self.rng
        w = self.w_bits
        self._put_start(0xB5)
        w.put_bits(8, 4)  # picture coding extension id
        f = self.f_code
        for _ in range(4):
            w.put_bits(f, 4)
        self.dc_precision = (
            rng.randrange(3) if self.opt_dcp is None else self.opt_dcp
        )
        w.put_bits(self.dc_precision, 2)
        w.put_bits(3, 2)  # frame picture
        w.put_bits(0, 1)  # top_field_first
        w.put_bits(1, 1)  # frame_pred_frame_dct
        w.put_bits(0, 1)  # concealment
        self.q_scale_type = (
            rng.randrange(2) if self.opt_qst is None else self.opt_qst
        )
        w.put_bits(self.q_scale_type, 1)
        self.intra_vlc_format = (
            rng.randrange(2) if self.opt_ivf is None else self.opt_ivf
        )
        w.put_bits(self.intra_vlc_format, 1)
        self.alternate_scan = (
            rng.randrange(2) if self.opt_alt is None else self.opt_alt
        )
        w.put_bits(self.alternate_scan, 1)
        w.put_bits(0, 1)  # repeat_first_field
        w.put_bits(1, 1)  # chroma_420_type
        w.put_bits(1, 1)  # progressive_frame
        w.put_bits(0, 1)  # composite_display_flag

    # -- slices / macroblocks -------------------------------------------
    def _slices(self, ct):
        rng = self.rng
        for row in range(self.mb_h):
            self._put_start(row + 1)
            w = self.w_bits
            qcode = rng.randrange(1, 32)
            self.q_scale = self.qmap[qcode]
            w.put_bits(qcode, 5)
            w.put_bits(0, 1)  # slice extra info
            # slice start: reset predictors (mpeg2.cpp:1507)
            self._reset_dc()
            self._reset_mv()
            self.prev_type = 0
            # choose coded positions: first and last always coded; in P
            # pictures interior MBs may be skipped; in B too (with rules)
            # B-picture skips propagate PMVs to other columns where they may
            # violate the in-frame MV window; until span-safe MV selection
            # lands, only P pictures emit skips (zero-MV copies, always safe)
            coded = [True] * self.mb_w
            if ct == P and self.mb_w > 2:
                for x in range(1, self.mb_w - 1):
                    coded[x] = rng.random() > 0.25
            x = 0
            pend_skip = 0
            for xi in range(self.mb_w):
                if not coded[xi]:
                    pend_skip += 1
                    continue
                inc = pend_skip + 1
                self._emit_mb_inc(inc)
                if pend_skip and ct != B:
                    # P skip: predictors reset (m2d_skip_mb_P tail)
                    self._reset_dc()
                    self._reset_mv()
                pend_skip = 0
                self._macroblock(ct, xi, row)
            self.w_bits.byte_align(0)

    def _qcode_for(self, qs):
        return self.qmap.index(qs) if qs in self.qmap else 1

    def _emit_mb_inc(self, inc):
        while inc > 33:
            self._vlc(ENC_MB_INC, "ESC")
            inc -= 33
        self._vlc(ENC_MB_INC, inc)

    def _reset_dc(self):
        self.dc_pred = [(self.dc_max + 1) >> 1] * 3

    def _reset_mv(self):
        self.pmv = [[0, 0], [0, 0]]

    # -- macroblock ------------------------------------------------------
    def _macroblock(self, ct, mbx, mby):
        rng = self.rng
        if ct == I:
            mb_type = rng.choice([MB_INTRA, MB_INTRA | MB_QUANT])
        elif ct == P:
            mb_type = rng.choice(
                [
                    MB_FORWARD | MB_PATTERN,
                    MB_FORWARD | MB_PATTERN | MB_QUANT,
                    MB_FORWARD,
                    MB_PATTERN,
                    MB_PATTERN | MB_QUANT,
                    MB_INTRA,
                    MB_INTRA | MB_QUANT,
                ]
            )
        else:
            # avoid skip-after-intra at the *next* MB: harmless here because
            # skip decisions were made per-row; ensure intra is rarer
            choices = [
                MB_FORWARD | MB_BACKWARD,
                MB_FORWARD | MB_BACKWARD | MB_PATTERN,
                MB_FORWARD | MB_BACKWARD | MB_PATTERN | MB_QUANT,
                MB_FORWARD,
                MB_FORWARD | MB_PATTERN,
                MB_FORWARD | MB_PATTERN | MB_QUANT,
                MB_BACKWARD,
                MB_BACKWARD | MB_PATTERN,
                MB_BACKWARD | MB_PATTERN | MB_QUANT,
                MB_INTRA,
                MB_INTRA | MB_QUANT,
            ]
            mb_type = rng.choice(choices)
        self._vlc(ENC_MB_TYPE[ct - 1], mb_type)

        prev_intra = self.prev_type & MB_INTRA
        now_intra = mb_type & MB_INTRA
        if now_intra and not prev_intra:
            self._reset_dc()
        if not now_intra and prev_intra:
            self._reset_mv()
        self.prev_type = mb_type

        # frame_pred_frame_dct=1: no motion_type / dct_type bits
        if mb_type & MB_QUANT:
            code = self.rng.randrange(1, 32)
            self.q_scale = self.qmap[code]
            self.w_bits.put_bits(code, 5)

        if now_intra:
            self._intra_blocks()
            return

        if mb_type & MB_MC:
            if mb_type & MB_FORWARD:
                self._motion_vector(0, mbx, mby)
            if mb_type & MB_BACKWARD:
                self._motion_vector(1, mbx, mby)
        else:
            # no-MC P macroblock: reference resets both predictors
            self._reset_dc()
            self._reset_mv()

        if mb_type & MB_PATTERN:
            cbp = self.rng.randrange(1, 64)
            self._vlc(ENC_CBP, cbp)
            for blk in range(6):
                bit = (1 << (5 - blk)) if blk < 4 else (1 << (1 - (blk - 4)))
                if cbp & bit:
                    self._inter_block()

    # -- motion vectors --------------------------------------------------
    def _safe_mv_range(self, mbx, mby):
        """Half-pel MV box keeping the 17x17 luma and 9x9 chroma windows
        inside the padded frame."""
        w16, h16 = self.mb_w * 16, self.mb_h * 16
        # luma: 0 <= mbx*16 + (mvx>>1) and mbx*16 + (mvx>>1) + 17 <= w16
        lx0 = -mbx * 16
        lx1 = w16 - 17 - mbx * 16
        ly0 = -mby * 16
        ly1 = h16 - 17 - mby * 16
        # chroma windows are strictly inside luma windows for mv/2; the
        # conservative bound below keeps both safe
        x0, x1 = 2 * lx0 + 2, 2 * lx1 - 2
        y0, y1 = 2 * ly0 + 2, 2 * ly1 - 2
        return max(x0, -(16 << self.r_size)), min(x1, (16 << self.r_size) - 1), \
            max(y0, -(16 << self.r_size)), min(y1, (16 << self.r_size) - 1)

    def _motion_vector(self, s, mbx, mby):
        rng = self.rng
        x0, x1, y0, y1 = self._safe_mv_range(mbx, mby)
        for xy, (lo, hi) in enumerate(((x0, x1), (y0, y1))):
            pred = self.pmv[s][xy]
            if lo <= pred <= hi and rng.random() < 0.3:
                target = pred  # emit '1' (no-change) sometimes
            else:
                target = rng.randint(lo, hi) if lo <= hi else 0
            self._emit_one_mv(s, xy, target)

    def _emit_one_mv(self, s, xy, target):
        """Emit motion_code+residual so the decoder lands on `target`
        (inverse of mpeg2.cpp:1189-1210)."""
        r_size = self.r_size
        pred = self.pmv[s][xy]
        limit = 16 << r_size
        delta = target - pred
        # wrap into [-limit, limit)
        while delta < -limit:
            delta += 2 * limit
        while delta >= limit:
            delta -= 2 * limit
        # decoder wraps pred+delta into [-limit, limit); verify it lands on
        # target
        mv = pred + delta
        if mv < -limit:
            mv += 2 * limit
        elif mv >= limit:
            mv -= 2 * limit
        assert mv == target, (mv, target, pred, delta)
        if delta == 0:
            self._vlc(ENC_MOTION, 0)
        else:
            a = abs(delta)
            code = ((a - 1) >> r_size) + 1
            residual = (a - 1) & ((1 << r_size) - 1)
            self._vlc(ENC_MOTION, code if delta > 0 else -code)
            if r_size > 0:
                self.w_bits.put_bits(residual, r_size)
        self.pmv[s][xy] = mv

    # -- blocks ----------------------------------------------------------
    def _random_coefs(self, start_idx, max_coefs=8):
        """Random (scan_idx, level) list with increasing scan index."""
        rng = self.rng
        n = rng.randrange(0, max_coefs + 1)
        idxs = sorted(rng.sample(range(start_idx, 64), min(n, 64 - start_idx)))
        out = []
        for i in idxs:
            # mostly small levels (VLC-codable), sometimes large (escape)
            if rng.random() < 0.8:
                lvl = rng.choice([1, -1, 2, -2, 3, -3, 4, -4, 5, -5])
            else:
                lvl = rng.randrange(-255, 256) if self.mpeg1 else rng.randrange(-2048, 2048)
                if lvl == 0:
                    lvl = 7
            out.append((i, lvl))
        return out

    def _emit_coef_run(self, table_idx, run, level, first_inter=False):
        rng = self.rng
        enc = ENC_DCT[table_idx]
        key = (run, level)
        can_table = key in enc
        if first_inter and run == 0 and abs(level) == 1:
            # '1s' first-coefficient shortcut is MANDATORY for table 0
            # (any table-0 code starting '1' would alias; mpeg2.cpp:1317-1326)
            self.w_bits.put_bits(2 if level > 0 else 3, 2)
            return
        if can_table and rng.random() < 0.75:
            self.w_bits.put_bitstring(enc[key])
            return
        # escape
        self.w_bits.put_bitstring(enc["ESC"])
        self.w_bits.put_bits(run, 6)
        if self.mpeg1:
            if -127 <= level <= 127 and level != 0:
                self.w_bits.put_bits(level & 0xFF, 8)
            elif level > 0:
                self.w_bits.put_bits(0x00, 8).put_bits(level, 8)
            else:
                self.w_bits.put_bits(0x80, 8).put_bits(level + 256, 8)
        else:
            self.w_bits.put_bits(level & 0xFFF, 12)

    # -- dequant mirrors (must match entropy.py exactly) -----------------
    def _dequant_levels(self, coefs, intra, start_mismatch, coef):
        """Apply inverse quant + saturation + mismatch control into `coef`
        (raster), mirroring mpeg2.cpp:943-983 / :1000-1013."""
        qmat = self.qmat_intra if intra else self.qmat_nonintra
        mismatch = start_mismatch
        for idx, lvl in coefs:
            pos = self.scan[idx]
            q = qmat[pos] * self.q_scale
            if intra:
                t = (abs(lvl) * q) >> 4
            else:
                t = ((2 * abs(lvl) + 1) * q) >> 5
            val = -t if lvl < 0 else t
            val = min(max(val, -2048), 2047)
            mismatch += val
            coef[pos] = val
        if self.mpeg1:
            for pos in range(64):
                c = coef[pos]
                if c and not c & 1:
                    coef[pos] = c - 1 if c > 0 else c + 1
        else:
            if not mismatch & 1:
                coef[63] ^= 1
        return coef

    def _idct_ok(self, coef, rng_bounds):
        # linearity bound: |idct out| <= 0.5 * sum|coef| + rounding slack,
        # so small blocks are provably in-domain without running the IDCT
        if np.abs(coef).sum() + 8 <= 2 * min(-rng_bounds[0], rng_bounds[1]):
            return True
        out = idct8x8(np.asarray(coef, np.int16).reshape(1, 8, 8), np)[0]
        return rng_bounds[0] <= out.min() and out.max() <= rng_bounds[1]

    def _intra_blocks(self):
        rng = self.rng
        table_idx = self.intra_vlc_format
        for blk in range(6):
            comp = 0 if blk < 4 else blk - 3
            # DC: pick a target inside [0, dc_max] so the predictor never
            # drifts outside the reference's LUT-safe IDCT domain
            if rng.random() < 0.3:
                target = self.dc_pred[comp]  # size-0 code
            else:
                target = rng.randint(0, self.dc_max)
            diff = target - self.dc_pred[comp]
            size = abs(diff).bit_length()
            pred = self.dc_pred[comp] + diff
            if size:
                dc_out = min(max(pred, 0), self.dc_max) << self.dc_scale
            else:
                dc_out = pred << self.dc_scale
            # AC with IDCT-domain shrink loop
            coefs = self._random_coefs(1)
            while True:
                coef = np.zeros(64, np.int64)
                coef[0] = dc_out
                self._dequant_levels(coefs, True, dc_out, coef)
                if self._idct_ok(coef, INTRA_IDCT_RANGE):
                    break
                coefs = [(i, l // 2) for i, l in coefs if abs(l) >= 2]
            # emit
            self._vlc(ENC_DC_SIZE[0 if comp == 0 else 1], size)
            if size:
                bits = diff if diff > 0 else diff - 1 + (1 << size)
                self.w_bits.put_bits(bits & ((1 << size) - 1), size)
            self.dc_pred[comp] = pred
            prev = 0
            for idx, lvl in coefs:
                self._emit_coef_run(table_idx, idx - prev - 1, lvl)
                prev = idx
            self._vlc(ENC_DCT[table_idx], "EOB")

    def _inter_block(self):
        coefs = self._random_coefs(0)
        if not coefs:
            coefs = [(0, 1)]
        while True:
            coef = np.zeros(64, np.int64)
            first_dc = coefs and coefs[0][0] == 0 and abs(coefs[0][1]) == 1
            if first_dc:
                lvl = coefs[0][1]
                q = self.q_scale * self.qmat_nonintra[0]
                t = ((2 * abs(lvl) + 1) * q) >> 5
                coef[0] = np.int16(t if lvl > 0 else -t)  # unsaturated
                rest = coefs[1:]
                self._dequant_levels(rest, False, int(coef[0]), coef)
            else:
                self._dequant_levels(coefs, False, 0, coef)
            if self._idct_ok(coef, INTER_IDCT_RANGE):
                break
            shrunk = [(i, l // 2) for i, l in coefs if abs(l) >= 2]
            coefs = shrunk if shrunk else [(0, 1)]
        prev = -1
        first = True
        for idx, lvl in coefs:
            run = idx - prev - 1
            self._emit_coef_run(0, run, lvl, first_inter=first and idx == 0)
            first = False
            prev = idx
        self._vlc(ENC_DCT[0], "EOB")


class Mpeg2FieldMcGen(Mpeg2StreamGen):
    """frame_pred_frame_dct=0 streams mixing frame and field motion
    (frame_motion_type 2/1) with per-field reference selects and
    explicit dct_type bits.

    PMV model extends to two pairs per direction: frame MVs write pair 0
    and copy to pair 1 (mpeg2.cpp:1265-1266); field MVs address pair i
    with the vertical predictor halved (pred>>1, stored <<1,
    mpeg2.cpp:1189-1210 is_field=1).
    """

    def __init__(self, *args, field_prob=0.5, dual_prob=0.0, mt0_prob=0.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.field_prob = field_prob
        self.dual_prob = dual_prob
        # probability that a field-MC macroblock emits the reserved
        # motion_type code 0 instead of 1: the reference's table maps
        # both to the same row (m2d_motion_type "dummy" entries,
        # mpeg2.cpp:819-831)
        self.mt0_prob = mt0_prob

    def _reset_mv(self):
        self.pmv2 = [[[0, 0], [0, 0]] for _ in range(2)]
        self.pmv = [[0, 0], [0, 0]]  # pair-0 view for base B-skip spans

    def _picture_coding_extension(self, ct):
        rng = self.rng
        w = self.w_bits
        self._put_start(0xB5)
        w.put_bits(8, 4)
        for _ in range(4):
            w.put_bits(self.f_code, 4)
        self.dc_precision = (
            rng.randrange(3) if self.opt_dcp is None else self.opt_dcp
        )
        w.put_bits(self.dc_precision, 2)
        w.put_bits(3, 2)  # frame picture
        w.put_bits(0, 1)  # top_field_first
        w.put_bits(0, 1)  # frame_pred_frame_dct = 0
        w.put_bits(0, 1)  # concealment
        self.q_scale_type = (
            rng.randrange(2) if self.opt_qst is None else self.opt_qst
        )
        w.put_bits(self.q_scale_type, 1)
        self.intra_vlc_format = (
            rng.randrange(2) if self.opt_ivf is None else self.opt_ivf
        )
        w.put_bits(self.intra_vlc_format, 1)
        self.alternate_scan = (
            rng.randrange(2) if self.opt_alt is None else self.opt_alt
        )
        w.put_bits(self.alternate_scan, 1)
        w.put_bits(0, 1)
        w.put_bits(1, 1)
        w.put_bits(1, 1)
        w.put_bits(0, 1)

    def _macroblock(self, ct, mbx, mby):
        rng = self.rng
        w = self.w_bits
        if ct == I:
            mb_type = rng.choice([MB_INTRA, MB_INTRA | MB_QUANT])
        elif ct == P:
            mb_type = rng.choice([
                MB_FORWARD | MB_PATTERN,
                MB_FORWARD | MB_PATTERN | MB_QUANT,
                MB_FORWARD,
                MB_PATTERN,
                MB_INTRA,
            ])
        else:
            mb_type = rng.choice([
                MB_FORWARD | MB_BACKWARD,
                MB_FORWARD | MB_BACKWARD | MB_PATTERN,
                MB_FORWARD,
                MB_FORWARD | MB_PATTERN,
                MB_BACKWARD,
                MB_BACKWARD | MB_PATTERN | MB_QUANT,
                MB_INTRA,
            ])
        self._vlc(ENC_MB_TYPE[ct - 1], mb_type)

        prev_intra = self.prev_type & MB_INTRA
        now_intra = mb_type & MB_INTRA
        if now_intra and not prev_intra:
            self._reset_dc()
        if not now_intra and prev_intra:
            self._reset_mv()
        self.prev_type = mb_type

        use_field = False
        use_dual = False
        if mb_type & MB_MC:
            u = rng.random()
            if u < self.dual_prob and not (mb_type & MB_BACKWARD):
                use_dual = True  # dual prime: P forward only
                w.put_bits(3, 2)
            elif u < self.dual_prob + self.field_prob:
                use_field = True
                w.put_bits(0 if rng.random() < self.mt0_prob else 1, 2)
            else:
                w.put_bits(2, 2)
        if mb_type & (MB_PATTERN | MB_INTRA):
            w.put_bits(rng.randrange(2), 1)  # dct_type
        if mb_type & MB_QUANT:
            code = rng.randrange(1, 32)
            self.q_scale = self.qmap[code]
            w.put_bits(code, 5)

        if now_intra:
            self._intra_blocks()
            return

        if mb_type & MB_MC:
            if mb_type & MB_FORWARD:
                self._motion_vectors2(0, mbx, mby, use_field,
                                      use_dual=use_dual)
            if mb_type & MB_BACKWARD:
                self._motion_vectors2(1, mbx, mby, use_field)
        else:
            self._reset_dc()
            self._reset_mv()

        if mb_type & MB_PATTERN:
            cbp = rng.randrange(1, 64)
            self._vlc(ENC_CBP, cbp)
            for blk in range(6):
                bit = (1 << (5 - blk)) if blk < 4 else (1 << (1 - (blk - 4)))
                if cbp & bit:
                    self._inter_block()

    def _motion_vectors2(self, s, mbx, mby, use_field, use_dual=False):
        rng = self.rng
        x0, x1, y0, y1 = self._safe_mv_range(mbx, mby)
        if use_dual:
            # reference decodes dual prime as a frame MC with the single
            # field-coded MV: horizontal normal, vertical stored <<1; the
            # dmvectors are parsed and discarded
            pred = self.pmv2[s][0][0]
            tx = pred if x0 <= pred <= x1 and rng.random() < 0.3 \
                else (rng.randint(x0, x1) if x0 <= x1 else 0)
            self._emit_mv2(s, 0, 0, tx, 0)
            self._emit_dmv()
            predy = self.pmv2[s][0][1] >> 1
            # applied as a FRAME vertical by the reference's MC
            ty = predy if y0 <= predy <= y1 and rng.random() < 0.3 \
                else (rng.randint(max(y0, -30), min(y1, 30))
                      if y0 <= y1 else 0)
            self._emit_mv2(s, 0, 1, ty, 1)
            self._emit_dmv()
            self.pmv2[s][1][0] = self.pmv2[s][0][0]
            self.pmv2[s][1][1] = self.pmv2[s][0][1]
            self.pmv[s][0] = self.pmv2[s][0][0]
            self.pmv[s][1] = self.pmv2[s][0][1]
            return
        if not use_field:
            for xy, (lo, hi) in enumerate(((x0, x1), (y0, y1))):
                pred = self.pmv2[s][0][xy]
                target = pred if lo <= pred <= hi and rng.random() < 0.3 \
                    else (rng.randint(lo, hi) if lo <= hi else 0)
                self._emit_mv2(s, 0, xy, target, 0)
            self.pmv2[s][1][0] = self.pmv2[s][0][0]
            self.pmv2[s][1][1] = self.pmv2[s][0][1]
        else:
            # vertical targets in FIELD units; /2 frame bounds keep the
            # 2-step 16-row window + next-field tap inside the frame
            fy0, fy1 = (y0 >> 1) + 1, (y1 >> 1) - 1
            for pair in range(2):
                self.w_bits.put_bits(rng.randrange(2), 1)  # field select
                pred = self.pmv2[s][pair][0]
                tx = pred if x0 <= pred <= x1 and rng.random() < 0.3 \
                    else (rng.randint(x0, x1) if x0 <= x1 else 0)
                self._emit_mv2(s, pair, 0, tx, 0)
                predy = self.pmv2[s][pair][1] >> 1
                ty = predy if fy0 <= predy <= fy1 and rng.random() < 0.3 \
                    else (rng.randint(fy0, fy1) if fy0 <= fy1 else 0)
                self._emit_mv2(s, pair, 1, ty, 1)
        self.pmv[s][0] = self.pmv2[s][0][0]
        self.pmv[s][1] = self.pmv2[s][0][1]

    def _emit_dmv(self):
        if self.rng.random() < 0.5:
            self.w_bits.put_bits(0, 1)
        else:
            self.w_bits.put_bits(1, 1)
            self.w_bits.put_bits(self.rng.randrange(2), 1)

    def _emit_mv2(self, s, pair, xy, target, is_field):
        r_size = self.r_size
        pred = self.pmv2[s][pair][xy] >> is_field
        limit = 16 << r_size
        delta = target - pred
        while delta < -limit:
            delta += 2 * limit
        while delta >= limit:
            delta -= 2 * limit
        mv = pred + delta
        if mv < -limit:
            mv += 2 * limit
        elif mv >= limit:
            mv -= 2 * limit
        assert mv == target, (mv, target)
        if delta == 0:
            self._vlc(ENC_MOTION, 0)
        else:
            a = abs(delta)
            code = ((a - 1) >> r_size) + 1
            residual = (a - 1) & ((1 << r_size) - 1)
            self._vlc(ENC_MOTION, code if delta > 0 else -code)
            if r_size > 0:
                self.w_bits.put_bits(residual, r_size)
        self.pmv2[s][pair][xy] = mv << is_field


class Mpeg2FieldPicGen(Mpeg2FieldMcGen):
    """Field *pictures* (picture_structure 1/2), one field per pattern
    letter, alternating top/bottom.

    Mirrors the reference's field-picture decode model exactly
    (mpeg2.cpp): frame_mode=0, so every MB omits the dct_type bit
    (forced 1), motion_type comes from m2d_motion_type[1][idx]
    (1 = field MC decoded as a plain frame MC with the field-unit MV
    and a discarded vertical_field_select, 2 = 16x8 MC via the
    stride-doubled pair path, 3 = field dual prime with discarded
    dmvectors), and each field rotates the frame pool as its own
    picture. All mb rows are coded so no stale buffer content leaks
    into the output (the reference never clears its frame heap)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._structure = 1

    def _picture_coding_extension(self, ct):
        rng = self.rng
        w = self.w_bits
        self._put_start(0xB5)
        w.put_bits(8, 4)
        for _ in range(4):
            w.put_bits(self.f_code, 4)
        self.dc_precision = (
            rng.randrange(3) if self.opt_dcp is None else self.opt_dcp
        )
        w.put_bits(self.dc_precision, 2)
        w.put_bits(self._structure, 2)  # field picture (top/bottom)
        self._structure = 3 - self._structure
        w.put_bits(0, 1)  # top_field_first
        w.put_bits(0, 1)  # frame_pred_frame_dct
        w.put_bits(0, 1)  # concealment
        self.q_scale_type = (
            rng.randrange(2) if self.opt_qst is None else self.opt_qst
        )
        w.put_bits(self.q_scale_type, 1)
        self.intra_vlc_format = (
            rng.randrange(2) if self.opt_ivf is None else self.opt_ivf
        )
        w.put_bits(self.intra_vlc_format, 1)
        self.alternate_scan = (
            rng.randrange(2) if self.opt_alt is None else self.opt_alt
        )
        w.put_bits(self.alternate_scan, 1)
        w.put_bits(0, 1)
        w.put_bits(1, 1)
        w.put_bits(0, 1)  # progressive_frame
        w.put_bits(0, 1)

    def _macroblock(self, ct, mbx, mby):
        rng = self.rng
        w = self.w_bits
        if ct == I:
            mb_type = rng.choice([MB_INTRA, MB_INTRA | MB_QUANT])
        elif ct == P:
            mb_type = rng.choice([
                MB_FORWARD | MB_PATTERN,
                MB_FORWARD | MB_PATTERN | MB_QUANT,
                MB_FORWARD,
                MB_PATTERN,
                MB_INTRA,
            ])
        else:
            mb_type = rng.choice([
                MB_FORWARD | MB_BACKWARD,
                MB_FORWARD | MB_BACKWARD | MB_PATTERN,
                MB_FORWARD,
                MB_FORWARD | MB_PATTERN,
                MB_BACKWARD,
                MB_BACKWARD | MB_PATTERN | MB_QUANT,
                MB_INTRA,
            ])
        self._vlc(ENC_MB_TYPE[ct - 1], mb_type)

        prev_intra = self.prev_type & MB_INTRA
        now_intra = mb_type & MB_INTRA
        if now_intra and not prev_intra:
            self._reset_dc()
        if not now_intra and prev_intra:
            self._reset_mv()
        self.prev_type = mb_type

        use_16x8 = False
        use_dual = False
        if mb_type & MB_MC:
            u = rng.random()
            if u < self.dual_prob and not (mb_type & MB_BACKWARD):
                use_dual = True
                w.put_bits(3, 2)
            elif u < self.dual_prob + self.field_prob:
                use_16x8 = True
                w.put_bits(2, 2)  # 16x8 MC
            else:
                # field MC (plain frame MC in the ref); code 0 decodes
                # identically via the table's "dummy" row
                w.put_bits(0 if rng.random() < self.mt0_prob else 1, 2)
        # frame_mode == 0: NO dct_type bit
        if mb_type & MB_QUANT:
            code = rng.randrange(1, 32)
            self.q_scale = self.qmap[code]
            w.put_bits(code, 5)

        if now_intra:
            self._intra_blocks()
            return

        if mb_type & MB_MC:
            if mb_type & MB_FORWARD:
                self._motion_vectors_fieldpic(0, mbx, mby, use_16x8,
                                              use_dual)
            if mb_type & MB_BACKWARD:
                self._motion_vectors_fieldpic(1, mbx, mby, use_16x8, False)
        else:
            self._reset_dc()
            self._reset_mv()

        if mb_type & MB_PATTERN:
            cbp = rng.randrange(1, 64)
            self._vlc(ENC_CBP, cbp)
            for blk in range(6):
                bit = (1 << (5 - blk)) if blk < 4 else (1 << (1 - (blk - 4)))
                if cbp & bit:
                    self._inter_block()

    def _motion_vectors_fieldpic(self, s, mbx, mby, use_16x8, use_dual):
        rng = self.rng
        if use_dual or use_16x8:
            # identical bit/PMV/MC model to the frame-picture variants
            self._motion_vectors2(s, mbx, mby, use_16x8, use_dual=use_dual)
            return
        # field MC, 1 mv: vertical_field_select read-and-discarded, MV
        # decoded with is_field=1 vertical predictor but APPLIED as a
        # plain frame MC (m2d_motion_comp mv_count==1, mpeg2.cpp:1288)
        x0, x1, y0, y1 = self._safe_mv_range(mbx, mby)
        self.w_bits.put_bits(rng.randrange(2), 1)  # vfs (discarded)
        pred = self.pmv2[s][0][0]
        tx = pred if x0 <= pred <= x1 and rng.random() < 0.3 \
            else (rng.randint(x0, x1) if x0 <= x1 else 0)
        self._emit_mv2(s, 0, 0, tx, 0)
        predy = self.pmv2[s][0][1] >> 1
        ty = predy if y0 <= predy <= y1 and rng.random() < 0.3 \
            else (rng.randint(max(y0, -30), min(y1, 30)) if y0 <= y1 else 0)
        self._emit_mv2(s, 0, 1, ty, 1)
        self.pmv2[s][1][0] = self.pmv2[s][0][0]
        self.pmv2[s][1][1] = self.pmv2[s][0][1]
        self.pmv[s][0] = self.pmv2[s][0][0]
        self.pmv[s][1] = self.pmv2[s][0][1]
