/* Native H.264 Phase-A: slice entropy decode -> dense picture plan.
 *
 * Host-side bit-serial front end of the two-phase TPU engine: walks a
 * picture's slices once (CAVLC/CABAC, MV prediction, deblock-strength
 * recording) and fills the PicturePlan tensors that the batched XLA
 * Phase B consumes (m2dec_tpu/codecs/h264/reconstruct.py).  Semantics
 * mirror the verified Python Phase A (m2dec_tpu/codecs/h264/decoder.py
 * and friends) function-for-function, which in turn is bit-exact with
 * the reference decoder (reference: src/lib/h264.cpp slice_data
 * :10210-10251 and the mb_decode dispatch tables).
 *
 * Python owns NAL walking, SPS/PPS/slice headers, POC, ref lists, DPB
 * and marking; this module owns everything per-MB.
 */

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <initializer_list>

#include "h264_tables.inc"

namespace {

// ---------------------------------------------------------------------
// bit reader (payload is already emulation-prevention-stripped)
// ---------------------------------------------------------------------
struct BitReader {
    const uint8_t *base;
    int64_t nbits;     // total payload bits
    int64_t pos;       // consumed bits
    const uint8_t *p;
    const uint8_t *end;
    uint64_t cache;    // MSB-aligned
    int ncache;
    int64_t stop_bit;  // index of rbsp_stop_one_bit (last set bit)

    void init(const uint8_t *data, int64_t len_bytes, int64_t bit_offset) {
        base = data;
        nbits = len_bytes * 8;
        end = data + len_bytes;
        stop_bit = -1;
        for (int64_t i = len_bytes - 1; i >= 0 && stop_bit < 0; i--) {
            uint8_t b = data[i];
            if (b) {
                int tz = __builtin_ctz(b);
                stop_bit = i * 8 + (7 - tz);
            }
        }
        seek(bit_offset);
    }
    void seek(int64_t bit) {
        pos = bit;
        p = base + (bit >> 3);
        cache = 0;
        ncache = 0;
        int drop = bit & 7;
        fill();
        if (drop) {
            cache <<= drop;
            ncache -= drop;
            fill();
        }
    }
    void fill() {
        while (ncache <= 56) {
            uint64_t b = (p < end) ? *p++ : 0;
            cache |= b << (56 - ncache);
            ncache += 8;
        }
    }
    uint32_t show(int n) { return (uint32_t)(cache >> (64 - n)); }
    void skip(int n) {
        cache <<= n;
        ncache -= n;
        pos += n;
        fill();
    }
    uint32_t get(int n) {
        uint32_t v = show(n);
        skip(n);
        return v;
    }
    uint32_t get1() { return get(1); }
    void byte_align() {
        int r = (int)(pos & 7);
        if (r) skip(8 - r);
    }
    int ue() {
        // count leading zeros of the next bits
        uint32_t probe = show(32);
        if (probe == 0) { skip(32); return -1; }  // malformed; caller errors
        int lz = __builtin_clz(probe);
        skip(lz);
        return (int)get(lz + 1) - 1;
    }
    int se() {
        int v = ue();
        int sign = v & 1;
        v = (v + 1) >> 1;
        return sign ? v : -v;
    }
    bool more_rbsp_data() const { return pos < stop_bit; }
};

static int read_te(BitReader &r, int range) {
    if (range == 1) return r.get1() ^ 1;
    int v = r.ue();
    return v <= range ? v : range;
}

// ---------------------------------------------------------------------
// plan output pointers (numpy buffers owned by Python)
// ---------------------------------------------------------------------
struct PlanPtrs {
    int32_t *kind;         // [n]
    int32_t *t8x8;         // [n]
    int32_t *coef_luma;    // [n][256]
    int32_t *coef_chroma;  // [n][2][4][16]
    int32_t *i4_modes;     // [n][16]
    int32_t *i4_avail;     // [n][16]
    int32_t *i8_modes;     // [n][4]
    int32_t *i8_avail;     // [n][4]
    int32_t *i16_mode;     // [n]
    int32_t *chroma_mode;  // [n]
    int32_t *mb_avail;     // [n]
    int32_t *mv;           // [n][16][2][2]
    int32_t *slot;         // [n][4][2]
    int32_t *wp;           // [n][4][3][4]
    uint8_t *pcm;          // [n][384]
    // raw deblock records (finalized by Python)
    int32_t *deb_idc;      // [n]
    int32_t *deb_qpy;      // [n]
    int32_t *deb_qpc;      // [n][2]
    int32_t *deb_slicehdr; // [n][2]
    int32_t *deb_str4;     // [n][2]  (vert, horiz)
    int64_t *deb_str;      // [n][2]  (str_vert, str_horiz)
};

// ---------------------------------------------------------------------
// parse state (mirrors h264d_mb_current neighbor caches, h264.h:374-419)
// ---------------------------------------------------------------------
struct PrevMb {   // decoder.PrevMb
    int32_t type, cbp, cbf, chroma_pred_mode, transform8x8, mb_skip,
        direct8x8;
    int32_t ref[2][2];
    int32_t frmidx[2][2];
    int32_t mov[4][2][2];
    int32_t mvd[4][2][2];
};

struct RefInfo {  // per list per idx, filled by Python per slice
    int32_t frame_idx;
    int32_t poc;
    int32_t in_use;    // 0 none, 1 short, 2 long
    int32_t col_idx;   // index into col pages (L1 only), -1
};

struct SliceParams {
    int32_t slice_type;       // 0 P, 1 B, 2 I
    int32_t is_cabac;
    int32_t cabac_init_idc;   // post-adjust: 0 for I else idc+1
    int32_t qp;               // slice initial qp (already wrapped)
    int32_t first_mb;
    int32_t num_ref_idx[2];
    int32_t constrained_intra;
    int32_t t8x8_mode;
    int32_t chroma_qp_index[2];
    int32_t direct_spatial;
    int32_t weighted_mode;    // 0/1/2
    int32_t deb_idc_plus1;    // stored at first_mb
    int32_t alpha_ofs, beta_ofs;
    int32_t poc;              // current picture POC (temporal direct)
    int32_t lt_poc;           // reserved
    int64_t bit_offset;       // slice-header size in bits
};

enum { MB_INxN = 0, MB_I16x16 = 1, MB_IPCM = 25, MB_P16x16 = 26,
       MB_P16x8 = 27, MB_P8x16 = 28, MB_P8x8 = 29, MB_P8x8REF0 = 30,
       MB_PSKIP = 31 };
enum { P_SLICE = 0, B_SLICE = 1, I_SLICE = 2 };

struct CabacCtx;  // fwd

struct Ctx {
    int max_x, max_y, nmb;
    PlanPtrs plan;
    // persistent neighbor caches (across slices and pictures)
    int32_t left_pred[4];
    int32_t *top_pred;      // [max_x][4]
    int32_t left_coef[8];
    int32_t *top_coef;      // [max_x][8]
    PrevMb *mbtop;          // [max_x + 2]
    PrevMb mbleft;
    int32_t lefttop_ref[2];
    int32_t lefttop_mv[2][2];
    // per-slice / per-MB running state
    SliceParams sp;
    RefInfo refs[2][16];
    // weighted pred tables: per list per idx per plane (w, o); shifts
    int32_t wtab[2][32][3][2];
    int32_t wshift[2];  // (luma, chroma)
    int32_t implicit_w[32][32][2];  // [idx0][idx1] -> (w0, w1)
    // temporal direct scale tables (bdirect), per col ref
    // colocated pages
    const int32_t *col_type;   // [n]
    const int32_t *col_ref;    // [n][4]
    const int32_t *col_mv;     // [n][16][2]
    const int32_t *col_map;    // map_col_frameidx [16]
    int32_t *curr_type;        // current picture col page
    int32_t *curr_ref;
    int32_t *curr_mv;
    // temporal-direct scaling inputs (Python precomputes)
    int32_t map_col_to_list0[16];   // bdirect_map
    int32_t scale_tab[16];          // bdirect_scale
    int mb_x, mb_y, mb_pos, firstline;
    int qp, qp_chroma[2];
    int32_t qmaty[16], qmaty8[64], qmatc_buf[2][16];
    const int32_t *qmatc[2];
    int prev_qp_delta;
    int cbp;
    uint32_t cbf;
    int mb_type;
    int chroma_pred_mode;
    int64_t avail_saved;
    CabacCtx *cb;
};

// ---------------------------------------------------------------------
// dequant matrices (transforms.qmat4/qmat8/qpc_from_qpy)
// ---------------------------------------------------------------------
static void qmat4_fill(int qp, int32_t *m) {
    int32_t v[3];
    for (int i = 0; i < 3; i++) v[i] = NORM_ADJ4[qp % 6][i] << (qp / 6);
    for (int i = 0; i < 16; i++) {
        int r = i >> 2, c = i & 3;
        m[i] = (!((r & 1) || (c & 1))) ? v[0]
             : (((r & 1) && (c & 1)) ? v[1] : v[2]);
    }
}

static void qmat8_fill(int qp, int32_t *m) {
    int shift = qp / 6 - 2;
    int32_t v[6];
    for (int i = 0; i < 6; i++) {
        int32_t x = NORM_ADJ8[qp % 6][i];
        v[i] = shift >= 0 ? (x << shift) : (x >> -shift);
    }
    for (int i = 0; i < 64; i++) {
        int r = i >> 3, c = i & 7;
        int rm = r & 3, cm = c & 3, k;
        if (rm == 0 && cm == 0) k = 0;
        else if ((r & 1) && (c & 1)) k = 1;
        else if (rm == 2 && cm == 2) k = 2;
        else if ((rm == 0 && (c & 1)) || (cm == 0 && (r & 1))) k = 3;
        else if (rm == 0 || cm == 0) k = 4;
        else k = 5;
        m[i] = v[k];
    }
}

static int qpc_from_qpy(int qpy, int diff) {
    int qpc = qpy + diff;
    if (qpc <= 0) return 0;
    if (qpc >= 30) return QPC_ADJUST[(qpc < 51 ? qpc : 51) - 30];
    return qpc;
}

static void set_qp(Ctx &s, int qpy) {
    if (qpy < 0) qpy += 52;
    else if (qpy >= 52) qpy -= 52;
    s.qp = qpy;
    qmat4_fill(qpy, s.qmaty);
    if (s.sp.t8x8_mode) qmat8_fill(qpy, s.qmaty8);
    for (int i = 0; i < 2; i++) {
        int qpc = qpc_from_qpy(qpy, s.sp.chroma_qp_index[i]);
        s.qp_chroma[i] = qpc;
        if (qpc == qpy) {
            s.qmatc[i] = s.qmaty;
        } else {
            qmat4_fill(qpc, s.qmatc_buf[i]);
            s.qmatc[i] = s.qmatc_buf[i];
        }
    }
}

// ---------------------------------------------------------------------
// position / availability (h264.cpp:556-635, :9704-9715)
// ---------------------------------------------------------------------
static void set_mb_pos(Ctx &s, int mbpos) {
    s.mb_y = mbpos / s.max_x;
    s.mb_x = mbpos % s.max_x;
    s.firstline = s.max_x;
    s.prev_qp_delta = 0;
    s.mb_pos = mbpos;
    for (int x = 0; x < s.max_x; x++)
        for (int k = 0; k < 4; k++) s.top_pred[x * 4 + k] = 2;
    for (int k = 0; k < 4; k++) s.left_pred[k] = 0;
    for (int k = 0; k < 4; k++) s.top_pred[s.mb_x * 4 + k] = 0;
    for (int k = 0; k < 8; k++) s.left_coef[k] = 0;
    memset(&s.mbleft, 0, sizeof(PrevMb));
    s.lefttop_ref[0] = s.lefttop_ref[1] = 0;
    memset(s.lefttop_mv, 0, sizeof(s.lefttop_mv));
    s.cbf = 0;
    s.cbp = 0;
    s.mb_type = 0;
    s.chroma_pred_mode = 0;
}

static int get_avail(const Ctx &s) {
    int mbx = s.mb_x, fl = s.firstline;
    return ((mbx != 0 && fl < 0) << 3)
         | ((mbx != s.max_x - 1 && fl <= 1) << 2)
         | ((fl <= 0) << 1)
         | (mbx != 0 && fl != s.max_x);
}

static inline PrevMb &top_of(Ctx &s) { return s.mbtop[1 + s.mb_x]; }
static inline PrevMb &topright_of(Ctx &s) { return s.mbtop[2 + s.mb_x]; }

static uint32_t cbf_top(uint32_t cbf) {
    return ((cbf >> 16) & 0x700) | ((cbf >> 14) & 0xC0)
         | ((cbf >> 12) & 0x3C) | ((cbf >> 10) & 3);
}
static uint32_t cbf_left(uint32_t cbf) {
    return ((cbf >> 16) & 0x600) | ((cbf >> 15) & 0x100)
         | ((cbf >> 14) & 0x80) | ((cbf >> 13) & 0x40)
         | ((cbf >> 12) & 0x38) | ((cbf >> 11) & 4)
         | ((cbf >> 6) & 2) | ((cbf >> 5) & 1);
}

static int increment_mb_pos(Ctx &s) {
    PrevMb &t = top_of(s);
    PrevMb &l = s.mbleft;
    t.type = l.type = s.mb_type;
    t.cbp = l.cbp = s.cbp;
    t.chroma_pred_mode = l.chroma_pred_mode = s.chroma_pred_mode;
    t.cbf = cbf_top(s.cbf);
    l.cbf = cbf_left(s.cbf);
    s.cbf = 0;
    s.mb_pos += 1;
    int x = s.mb_x + 1;
    if (x >= s.max_x) {
        x = 0;
        s.mb_y += 1;
        if (s.mb_y >= s.max_y) {
            s.mb_x = x;
            return -1;
        }
    }
    s.mb_x = x;
    s.plan.deb_idc[s.mb_pos] = 0;
    if (s.firstline >= 0) s.firstline -= 1;
    return 0;
}

// ---------------------------------------------------------------------
// CAVLC residual (cavlc.py / reference residual_block_cavlc :2038-2110)
// ---------------------------------------------------------------------
struct CatInfo { int ofs, num, dc_mask, err_mask; const uint8_t *zz; };
static const uint8_t ZZ_CHROMA_DC[4] = {0, 1, 2, 3};
static const CatInfo CATS[6] = {
    {0, 16, 0, 15, ZIGZAG4},
    {1, 15, 15, 15, ZIGZAG4},
    {0, 16, 15, 15, ZIGZAG4},
    {0, 4, 0, 3, ZZ_CHROMA_DC},
    {1, 15, 15, 15, ZIGZAG4},
    {0, 64, 63, 63, ZIGZAG8},
};

static inline int get_nc(int na, int nb) {
    if (na >= 0) return nb >= 0 ? ((na + nb + 1) >> 1) : na;
    return nb >= 0 ? nb : 0;
}

static inline int read_lut(BitReader &r, const uint16_t *lut, int bits,
                           int *val) {
    uint32_t probe = r.show(bits);
    uint16_t e = lut[probe];
    int len = e & 31;
    if (!len) return -2;
    r.skip(len);
    *val = e >> 5;
    return 0;
}

static int level_prefix(BitReader &r) {
    int n = 0;
    while (r.get1() == 0) n++;
    return n;
}

/* returns min(total_coeff,15) or negative error; writes dequantized
 * coefficients into coeff[] (raster) for positions it touches. */
static int cavlc_residual(Ctx &s, BitReader &r, int na, int nb,
                          int32_t *coeff, const int32_t *qmat, int cat) {
    const CatInfo &ci = CATS[cat];
    int ctv;
    if (ci.num <= 4) {
        if (read_lut(r, CT_LUTS[4], CT_BITS[4], &ctv) < 0) return -2;
    } else {
        int nc = get_nc(na, nb);
        int cls = nc >= 8 ? 3 : (nc >= 4 ? 2 : (nc >= 2 ? 1 : 0));
        if (read_lut(r, CT_LUTS[cls], CT_BITS[cls], &ctv) < 0) return -2;
    }
    int total_coeff = (ctv >> 2) & 31;
    int trailing_ones = ctv & 3;
    if (total_coeff == 0) return 0;
    int32_t level[64];
    if (trailing_ones) {
        uint32_t ones = r.get(trailing_ones);
        for (int i = 0; i < trailing_ones; i++)
            level[i] = (ones >> (trailing_ones - 1 - i)) & 1 ? -1 : 1;
    }
    int suffix_len = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
    for (int i = trailing_ones; i < total_coeff; i++) {
        int lvl_prefix = level_prefix(r);
        int64_t lvl = (int64_t)lvl_prefix << suffix_len;
        if (suffix_len > 0 || lvl_prefix >= 14) {
            int size = suffix_len;
            if (lvl_prefix == 14 && size == 0) size = 4;
            else if (lvl_prefix == 15) size = 12;
            if (size) lvl += r.get(size);
        }
        if (suffix_len == 0 && lvl_prefix == 15) lvl += 15;
        if (i == trailing_ones && trailing_ones < 3) lvl += 2;
        lvl = (lvl & 1) ? (-(lvl + 1) >> 1) : ((lvl + 2) >> 1);
        level[i] = (int32_t)lvl;
        if (suffix_len == 0) suffix_len = 1;
        int64_t th = (int64_t)(3 << (suffix_len - 1));
        if (suffix_len < 6 && th * th < lvl * lvl) suffix_len++;
    }
    int zeros_left = 0;
    if (total_coeff < ci.num) {
        if (ci.num > 4) {
            if (read_lut(r, TZ_LUTS[total_coeff], TZ_BITS[total_coeff],
                         &zeros_left) < 0) return -2;
        } else {
            if (read_lut(r, TZC_LUTS[total_coeff], TZC_BITS[total_coeff],
                         &zeros_left) < 0) return -2;
        }
    }
    int run[64];
    for (int i = 0; i < total_coeff - 1; i++) {
        int rb = 0;
        if (zeros_left) {
            int zl = zeros_left < 7 ? zeros_left : 7;
            if (read_lut(r, RB_LUTS[zl], RB_BITS[zl], &rb) < 0) return -2;
        }
        run[i] = rb;
        zeros_left -= rb;
    }
    run[total_coeff - 1] = zeros_left;
    for (int k = ci.ofs; k < ci.ofs + ci.num; k++) coeff[k] = 0;
    int idx = ci.ofs - 1;
    for (int i = total_coeff - 1; i >= 0; i--) {
        idx = (idx + 1 + run[i]) & ci.err_mask;
        int zi = ci.zz[idx];
        coeff[zi] = level[i] * qmat[zi & ci.dc_mask];
    }
    return total_coeff < 15 ? total_coeff : 15;
}

// ---------------------------------------------------------------------
// DC transforms (transforms.py luma_dc_transform / chroma_dc_transform)
// ---------------------------------------------------------------------
static void luma_dc_transform(const int32_t *c, int32_t *dc) {
    int64_t t[16];
    // rows: H4 @ x
    for (int j = 0; j < 4; j++) {
        int64_t a = c[0 * 4 + j], b = c[1 * 4 + j], cc = c[2 * 4 + j],
                d = c[3 * 4 + j];
        t[0 * 4 + j] = a + b + cc + d;
        t[1 * 4 + j] = a + b - cc - d;
        t[2 * 4 + j] = a - b - cc + d;
        t[3 * 4 + j] = a - b + cc - d;
    }
    for (int i = 0; i < 4; i++) {
        int64_t a = t[i * 4 + 0], b = t[i * 4 + 1], cc = t[i * 4 + 2],
                d = t[i * 4 + 3];
        dc[i * 4 + 0] = (int32_t)((a + b + cc + d + 2) >> 2);
        dc[i * 4 + 1] = (int32_t)((a + b - cc - d + 2) >> 2);
        dc[i * 4 + 2] = (int32_t)((a - b - cc + d + 2) >> 2);
        dc[i * 4 + 3] = (int32_t)((a - b + cc - d + 2) >> 2);
    }
}

static void chroma_dc_transform(const int32_t *c, int32_t *dc) {
    int64_t t0 = (int64_t)c[0] + c[1], t1 = (int64_t)c[2] + c[3];
    int64_t u0 = (int64_t)c[0] - c[1], u1 = (int64_t)c[2] - c[3];
    dc[0] = (int32_t)((t0 + t1) >> 1);
    dc[1] = (int32_t)((u0 + u1) >> 1);
    dc[2] = (int32_t)((t0 - t1) >> 1);
    dc[3] = (int32_t)((u0 - u1) >> 1);
}

// ---------------------------------------------------------------------
// deblock records / intra save info
// ---------------------------------------------------------------------
static void store_strength_intra(Ctx &s, int64_t str_all) {
    int p = s.mb_pos;
    s.plan.deb_qpy[p] = s.qp;
    s.plan.deb_qpc[p * 2] = s.qp_chroma[0];
    s.plan.deb_qpc[p * 2 + 1] = s.qp_chroma[1];
    /* index 0 = vertical-edge set (reference str4_horiz/str_horiz),
     * index 1 = horizontal-edge set (str4_vert/str_vert) */
    s.plan.deb_str4[p * 2] = 1;
    s.plan.deb_str4[p * 2 + 1] = 1;
    s.plan.deb_str[p * 2] = str_all;
    s.plan.deb_str[p * 2 + 1] = str_all;
}

static void intra_save_info(Ctx &s, int transform8x8) {
    PrevMb &t = top_of(s);
    PrevMb &l = s.mbleft;
    s.lefttop_ref[0] = t.ref[1][0];
    s.lefttop_ref[1] = t.ref[1][1];
    s.lefttop_mv[0][0] = t.mov[3][0][0];
    s.lefttop_mv[0][1] = t.mov[3][0][1];
    s.lefttop_mv[1][0] = t.mov[3][1][0];
    s.lefttop_mv[1][1] = t.mov[3][1][1];
    for (PrevMb *n : {&t, &l}) {
        n->transform8x8 = transform8x8;
        n->direct8x8 = 0;
        memset(n->mov, 0, sizeof(n->mov));
        memset(n->mvd, 0, sizeof(n->mvd));
        for (int a = 0; a < 2; a++)
            for (int b = 0; b < 2; b++) n->ref[a][b] = n->frmidx[a][b] = -1;
    }
    s.curr_type[s.mb_pos] = 0;  // COL_MB16x16
    for (int k = 0; k < 4; k++) s.curr_ref[s.mb_pos * 4 + k] = -1;
}

static int avail_intra_of(Ctx &s, int avail) {
    if (s.sp.constrained_intra) {
        int clear = 0;
        if (MB_IPCM < topright_of(s).type) clear |= 4;
        if (MB_IPCM < top_of(s).type) clear |= 2;
        if (MB_IPCM < s.mbleft.type) clear |= 1;
        avail &= ~clear;
    }
    return avail;
}

// ---------------------------------------------------------------------
// CAVLC intra macroblocks (decoder.py _mb_intra*)
// ---------------------------------------------------------------------
struct Reader;  // unified CAVLC/CABAC reader facade comes with CABAC stage

static int read_me_cbp(BitReader &r, int inter) {
    int v = r.ue();
    if (v < 0) return -2;
    if (v >= 48) v = 0;
    return ME_CBP[inter][v];
}

static int read_qp_delta_cavlc(Ctx &s, BitReader &r) {
    int delta = r.se();
    delta = delta < -26 ? -26 : (delta > 25 ? 25 : delta);
    s.prev_qp_delta = delta;
    return delta;
}

// nC wiring for the 16 luma blocks in Z order (_LUMA_NC_WIRING):
// kind 0 = left cache, 1 = top cache, 2 = previous block of this MB
struct NcSpec { uint8_t kind, k; };
static const NcSpec NC_WIRING[16][2] = {
    {{0, 0}, {1, 0}}, {{2, 0}, {1, 1}}, {{0, 1}, {2, 0}}, {{2, 2}, {2, 1}},
    {{2, 1}, {1, 2}}, {{2, 4}, {1, 3}}, {{2, 3}, {2, 4}}, {{2, 6}, {2, 5}},
    {{0, 2}, {2, 2}}, {{2, 8}, {2, 3}}, {{0, 3}, {2, 8}}, {{2, 10}, {2, 9}},
    {{2, 9}, {2, 6}}, {{2, 12}, {2, 7}}, {{2, 11}, {2, 12}},
    {{2, 14}, {2, 13}},
};

static int nc_resolve(const Ctx &s, NcSpec spec, const int *nc, int avail,
                      bool is_left) {
    if (spec.kind == 2) return nc[spec.k];
    if (is_left) return (avail & 1) ? s.left_coef[spec.k] : -1;
    return (avail & 2) ? s.top_coef[s.mb_x * 8 + spec.k] : -1;
}

static void intra4x4_block_avail(int ai, int *out) {
    const int v[16] = {
        ai | ((ai & 2) ? 4 : 0), ai | ((ai & 2) ? 5 : 1), ai | 6, 3,
        ai | ((ai & 2) ? 5 : 1), ai | 1, 7, 3,
        ai | 6, 7, ai | 6, 3,
        7, 3, 7, 3};
    for (int i = 0; i < 16; i++) out[i] = v[i];
}

static const int ZPOS_Y[16] = {0, 0, 4, 4, 0, 0, 4, 4, 8, 8, 12, 12, 8, 8,
                               12, 12};
static const int ZPOS_X[16] = {0, 4, 0, 4, 8, 12, 8, 12, 0, 4, 0, 4, 8, 12,
                               8, 12};

// forward decls for CABAC variants (implemented in the CABAC stage)
struct AeFns;
static int residual_block_any(Ctx &s, BitReader &r, int na, int nb,
                              int32_t *coeff, const int32_t *qmat, int cat,
                              int pos4x4, int avail);
static int read_cbp_any(Ctx &s, BitReader &r, int avail, int inter);
static int read_qp_delta_any(Ctx &s, BitReader &r);
static int read_intra_pred_mode_any(Ctx &s, BitReader &r, int pa, int pb);
static int read_chroma_mode_any(Ctx &s, BitReader &r, int avail_intra);
static int read_transform8x8_any(Ctx &s, BitReader &r, int avail);

static void pred_intra4x4_modes(Ctx &s, BitReader &r, int a, int *pr) {
    int32_t *left = s.left_pred;
    int32_t *top = &s.top_pred[s.mb_x * 4];
    pr[0] = read_intra_pred_mode_any(s, r, (a & 2) ? left[0] : 2,
                                     (a & 1) ? top[0] : 2);
    pr[1] = read_intra_pred_mode_any(s, r, (a & 2) ? pr[0] : 2, top[1]);
    pr[2] = read_intra_pred_mode_any(s, r, left[1], (a & 1) ? pr[0] : 2);
    pr[3] = read_intra_pred_mode_any(s, r, pr[2], pr[1]);
    pr[4] = read_intra_pred_mode_any(s, r, (a & 2) ? pr[1] : 2, top[2]);
    pr[5] = read_intra_pred_mode_any(s, r, (a & 2) ? pr[4] : 2, top[3]);
    pr[6] = read_intra_pred_mode_any(s, r, pr[3], pr[4]);
    pr[7] = read_intra_pred_mode_any(s, r, pr[6], pr[5]);
    pr[8] = read_intra_pred_mode_any(s, r, left[2], (a & 1) ? pr[2] : 2);
    pr[9] = read_intra_pred_mode_any(s, r, pr[8], pr[3]);
    pr[10] = read_intra_pred_mode_any(s, r, left[3], (a & 1) ? pr[8] : 2);
    pr[11] = read_intra_pred_mode_any(s, r, pr[10], pr[9]);
    pr[12] = read_intra_pred_mode_any(s, r, pr[9], pr[6]);
    pr[13] = read_intra_pred_mode_any(s, r, pr[12], pr[7]);
    pr[14] = read_intra_pred_mode_any(s, r, pr[11], pr[12]);
    pr[15] = read_intra_pred_mode_any(s, r, pr[14], pr[13]);
    left[0] = pr[5]; left[1] = pr[7]; left[2] = pr[13]; left[3] = pr[15];
    top[0] = pr[10]; top[1] = pr[11]; top[2] = pr[14]; top[3] = pr[15];
}

static void intra_chroma_pred(Ctx &s, BitReader &r, int avail_intra) {
    int mode = read_chroma_mode_any(s, r, avail_intra);
    s.plan.chroma_mode[s.mb_pos] = mode;
    s.plan.mb_avail[s.mb_pos] = avail_intra;
}

static void residual_chroma(Ctx &s, BitReader &r, int cbp, int avail) {
    int cbp_c = cbp >> 4;
    int32_t *lc = s.left_coef;
    int32_t *tc = &s.top_coef[s.mb_x * 8];
    if (!cbp_c) {
        lc[4] = lc[5] = lc[6] = lc[7] = 0;
        tc[4] = tc[5] = tc[6] = tc[7] = 0;
        return;
    }
    int32_t coeff[64];
    int32_t dc[2][4];
    for (int i = 0; i < 2; i++) {
        if (residual_block_any(s, r, 0, 0, coeff, s.qmatc[i], 3, 16 + i,
                               avail)) {
            chroma_dc_transform(coeff, dc[i]);
        } else {
            dc[i][0] = dc[i][1] = dc[i][2] = dc[i][3] = 0;
        }
    }
    int32_t *pc = &s.plan.coef_chroma[s.mb_pos * 128];  // [2][4][16]
    if (cbp_c & 2) {
        int32_t left[4] = {lc[4], lc[5], lc[6], lc[7]};
        int32_t topv[4] = {tc[4], tc[5], tc[6], tc[7]};
        int32_t new_left[4] = {0, 0, 0, 0}, new_top[4] = {0, 0, 0, 0};
        for (int i = 0; i < 2; i++) {
            int c0l = (avail & 1) ? left[i * 2] : -1;
            int c2l = (avail & 1) ? left[i * 2 + 1] : -1;
            int c0t = (avail & 2) ? topv[i * 2] : -1;
            int c1t = (avail & 2) ? topv[i * 2 + 1] : -1;
            int nc[4] = {0, 0, 0, 0};
            for (int b = 0; b < 4; b++) {
                int na, nb2;
                if (b == 0) { na = c0l; nb2 = c0t; }
                else if (b == 1) { na = nc[0]; nb2 = c1t; }
                else if (b == 2) { na = c2l; nb2 = nc[0]; }
                else { na = nc[2]; nb2 = nc[1]; }
                int cnum = residual_block_any(s, r, na, nb2, coeff,
                                              s.qmatc[i], 4,
                                              18 + i * 4 + b, avail);
                if (cnum < 0) return;  // propagated error unreachable here
                nc[b] = cnum;
                int32_t *dst = pc + i * 64 + b * 16;
                if (cnum) {
                    coeff[0] = dc[i][b];
                    memcpy(dst, coeff, 16 * sizeof(int32_t));
                } else {
                    dst[0] = dc[i][b];
                }
            }
            new_left[i * 2] = nc[1];
            new_left[i * 2 + 1] = nc[3];
            new_top[i * 2] = nc[2];
            new_top[i * 2 + 1] = nc[3];
        }
        for (int k = 0; k < 4; k++) {
            lc[4 + k] = new_left[k];
            tc[4 + k] = new_top[k];
        }
    } else {
        for (int i = 0; i < 2; i++)
            for (int b = 0; b < 4; b++) pc[i * 64 + b * 16] = dc[i][b];
        lc[4] = lc[5] = lc[6] = lc[7] = 0;
        tc[4] = tc[5] = tc[6] = tc[7] = 0;
    }
}

static int mb_intra4x4(Ctx &s, BitReader &r, int avail) {
    int avail_intra = avail_intra_of(s, avail);
    if (!(avail_intra & 1))
        for (int k = 0; k < 4; k++) s.left_pred[k] = 2;
    if (!(avail_intra & 2))
        for (int k = 0; k < 4; k++) s.top_pred[s.mb_x * 4 + k] = 2;
    int pr[16];
    pred_intra4x4_modes(s, r, avail_intra, pr);
    intra_chroma_pred(s, r, avail_intra);
    int cbp = read_cbp_any(s, r, avail, 0);
    if (cbp < 0) return -2;
    if (cbp) {
        int qp_delta = read_qp_delta_any(s, r);
        if (qp_delta) set_qp(s, s.qp + qp_delta);
    } else {
        s.prev_qp_delta = 0;
    }
    s.plan.kind[s.mb_pos] = 1;
    int blk_avail[16];
    intra4x4_block_avail(avail_intra, blk_avail);
    int nc[16] = {0};
    int32_t coeff[64];
    int32_t *cl = &s.plan.coef_luma[s.mb_pos * 256];
    int32_t *i4m = &s.plan.i4_modes[s.mb_pos * 16];
    int32_t *i4a = &s.plan.i4_avail[s.mb_pos * 16];
    for (int i = 0; i < 16; i++) {
        int by = ZPOS_Y[i], bx = ZPOS_X[i];
        int blk = (by >> 2) * 4 + (bx >> 2);
        i4m[blk] = pr[i];
        i4a[blk] = blk_avail[i];
        if (cbp & (1 << (i >> 2))) {
            int na = nc_resolve(s, NC_WIRING[i][0], nc, avail, true);
            int nb = nc_resolve(s, NC_WIRING[i][1], nc, avail, false);
            int cnum = residual_block_any(s, r, na, nb, coeff, s.qmaty, 2,
                                          i, avail_intra);
            if (cnum < 0) return -2;
            nc[i] = cnum;
            if (cnum) memcpy(cl + blk * 16, coeff, 16 * sizeof(int32_t));
        }
    }
    s.left_coef[0] = nc[5]; s.left_coef[1] = nc[7];
    s.left_coef[2] = nc[13]; s.left_coef[3] = nc[15];
    int32_t *tc = &s.top_coef[s.mb_x * 8];
    tc[0] = nc[10]; tc[1] = nc[11]; tc[2] = nc[14]; tc[3] = nc[15];
    store_strength_intra(s, 0xFFFFFFFFll);
    intra_save_info(s, 0);
    s.cbp = cbp;
    residual_chroma(s, r, cbp, avail);
    return 0;
}

static void pred_intra8x8_modes(Ctx &s, BitReader &r, int a, int *pr) {
    int32_t *left = s.left_pred;
    int32_t *top = &s.top_pred[s.mb_x * 4];
    pr[0] = read_intra_pred_mode_any(s, r, (a & 2) ? left[0] : 2,
                                     (a & 1) ? top[0] : 2);
    pr[1] = read_intra_pred_mode_any(s, r, (a & 2) ? pr[0] : 2, top[2]);
    pr[2] = read_intra_pred_mode_any(s, r, left[2], (a & 1) ? pr[0] : 2);
    pr[3] = read_intra_pred_mode_any(s, r, pr[2], pr[1]);
    left[0] = pr[1]; left[1] = pr[1]; left[2] = pr[3]; left[3] = pr[3];
    top[0] = pr[2]; top[1] = pr[2]; top[2] = pr[3]; top[3] = pr[3];
}

static int mb_intra8x8(Ctx &s, BitReader &r, int avail) {
    int avail_intra = avail_intra_of(s, avail);
    if (!(avail_intra & 1))
        for (int k = 0; k < 4; k++) s.left_pred[k] = 2;
    if (!(avail_intra & 2))
        for (int k = 0; k < 4; k++) s.top_pred[s.mb_x * 4 + k] = 2;
    int pr[4];
    pred_intra8x8_modes(s, r, avail_intra, pr);
    intra_chroma_pred(s, r, avail_intra);
    int cbp = read_cbp_any(s, r, avail, 0);
    if (cbp < 0) return -2;
    if (cbp) {
        int qp_delta = read_qp_delta_any(s, r);
        if (qp_delta) set_qp(s, s.qp + qp_delta);
    } else {
        s.prev_qp_delta = 0;
    }
    s.plan.kind[s.mb_pos] = 2;
    s.plan.t8x8[s.mb_pos] = 1;
    int blkav[4] = {
        (avail_intra & ~4) | ((avail_intra & 2) * 2),
        (avail_intra & ~8) | ((avail_intra & 2) * 4) | 1,
        6 | ((avail_intra & 1) * 9),
        11};
    int32_t coeff[64];
    int cs[4] = {0, 0, 0, 0};
    int32_t *lc = s.left_coef;
    int32_t *tcf = &s.top_coef[s.mb_x * 8];
    int32_t *cl = &s.plan.coef_luma[s.mb_pos * 256];
    for (int b = 0; b < 4; b++) {
        s.plan.i8_modes[s.mb_pos * 4 + b] = pr[b];
        s.plan.i8_avail[s.mb_pos * 4 + b] = blkav[b];
        if (cbp & (1 << b)) {
            int na, nb;
            if (b == 0) {
                na = (avail & 1) ? lc[0] : -1;
                nb = (avail & 2) ? tcf[0] : -1;
            } else if (b == 1) {
                na = cs[0];
                nb = (avail & 2) ? tcf[2] : -1;
            } else if (b == 2) {
                na = (avail & 1) ? lc[2] : -1;
                nb = cs[1];
            } else {
                na = cs[2];
                nb = cs[1];
            }
            int cnum = residual_block_any(s, r, na, nb, coeff, s.qmaty8, 5,
                                          b * 4, avail_intra);
            if (cnum < 0) return -2;
            cs[b] = cnum;
            if (cnum) memcpy(cl + b * 64, coeff, 64 * sizeof(int32_t));
        }
    }
    lc[0] = cs[1]; lc[1] = cs[1]; lc[2] = cs[3]; lc[3] = cs[3];
    tcf[0] = cs[2]; tcf[1] = cs[2]; tcf[2] = cs[3]; tcf[3] = cs[3];
    store_strength_intra(s, 0x00FF00FFll);
    intra_save_info(s, 1);
    s.cbp = cbp;
    residual_chroma(s, r, cbp, avail);
    return 0;
}

static int mb_intra16x16(Ctx &s, BitReader &r, int mbtype, int avail) {
    int k = mbtype - 1;
    int pred_mode = k & 3;
    static const int CBP_HI[3] = {0, 0x10, 0x20};
    int cbp = CBP_HI[(k >> 2) % 3] | (k >= 12 ? 0x0F : 0);
    int avail_intra = avail_intra_of(s, avail);
    s.plan.kind[s.mb_pos] = 3;
    s.plan.i16_mode[s.mb_pos] = pred_mode;
    s.plan.mb_avail[s.mb_pos] = avail_intra;
    intra_chroma_pred(s, r, avail_intra);
    int qp_delta = read_qp_delta_any(s, r);
    if (qp_delta) set_qp(s, s.qp + qp_delta);
    int na = (avail & 1) ? s.left_coef[0] : -1;
    int nb = (avail & 2) ? s.top_coef[s.mb_x * 8] : -1;
    int32_t coeff[64];
    int32_t dc[16] = {0};
    int cnum0 = residual_block_any(s, r, na, nb, coeff, s.qmaty, 0, 26,
                                   avail_intra);
    if (cnum0 < 0) return -2;
    if (cnum0) luma_dc_transform(coeff, dc);
    int32_t *cl = &s.plan.coef_luma[s.mb_pos * 256];
    if (cbp & 0x0F) {
        int nc[16] = {0};
        int new_left[4], new_top[4];
        for (int i = 0; i < 16; i++) {
            int na2 = nc_resolve(s, NC_WIRING[i][0], nc, avail, true);
            int nb2 = nc_resolve(s, NC_WIRING[i][1], nc, avail, false);
            int cnum = residual_block_any(s, r, na2, nb2, coeff, s.qmaty,
                                          1, i, avail_intra);
            if (cnum < 0) return -2;
            nc[i] = cnum;
            int by = ZPOS_Y[i], bx = ZPOS_X[i];
            int blk = (by >> 2) * 4 + (bx >> 2);
            int dci = blk;
            if (cnum) {
                coeff[0] = dc[dci];
                memcpy(cl + blk * 16, coeff, 16 * sizeof(int32_t));
            } else {
                cl[blk * 16] = dc[dci];
            }
        }
        new_left[0] = nc[5]; new_left[1] = nc[7];
        new_left[2] = nc[13]; new_left[3] = nc[15];
        new_top[0] = nc[10]; new_top[1] = nc[11];
        new_top[2] = nc[14]; new_top[3] = nc[15];
        for (int j = 0; j < 4; j++) {
            s.left_coef[j] = new_left[j];
            s.top_coef[s.mb_x * 8 + j] = new_top[j];
        }
    } else {
        for (int blk = 0; blk < 16; blk++) cl[blk * 16] = dc[blk];
        for (int j = 0; j < 4; j++) {
            s.left_coef[j] = 0;
            s.top_coef[s.mb_x * 8 + j] = 0;
        }
    }
    for (int j = 0; j < 4; j++) {
        s.left_pred[j] = 2;
        s.top_pred[s.mb_x * 4 + j] = 2;
    }
    store_strength_intra(s, 0xFFFFFFFFll);
    intra_save_info(s, 0);
    s.cbp = cbp;
    residual_chroma(s, r, cbp, avail);
    return 0;
}

static int mb_intrapcm(Ctx &s, BitReader &r) {
    r.byte_align();
    uint8_t *dst = &s.plan.pcm[s.mb_pos * 384];
    for (int i = 0; i < 384; i++) dst[i] = (uint8_t)r.get(8);
    s.plan.kind[s.mb_pos] = 4;
    for (int k = 0; k < 4; k++) {
        s.left_coef[k] = 15;
        s.left_coef[4 + k] = 15;
        s.top_coef[s.mb_x * 8 + k] = 15;
        s.top_coef[s.mb_x * 8 + 4 + k] = 15;
        s.left_pred[k] = 2;
        s.top_pred[s.mb_x * 4 + k] = 2;
    }
    int p = s.mb_pos;
    s.plan.deb_qpy[p] = 0;
    s.plan.deb_qpc[p * 2] = s.qp_chroma[0] - s.qp;
    s.plan.deb_qpc[p * 2 + 1] = s.qp_chroma[1] - s.qp;
    s.plan.deb_str4[p * 2] = 1;
    s.plan.deb_str4[p * 2 + 1] = 1;
    s.plan.deb_str[p * 2] = 0xFF00FFll;
    s.plan.deb_str[p * 2 + 1] = 0xFF00FFll;
    s.prev_qp_delta = 0;
    s.cbp = 0x3F;
    s.cbf = 0x7FFFFFF;
    intra_save_info(s, 0);
    return 0;
}

// ---------------------------------------------------------------------
// CAVLC/CABAC syntax dispatchers (CABAC arms filled in the CABAC stage)
// ---------------------------------------------------------------------
static int cabac_residual(Ctx &s, BitReader &r, int32_t *coeff,
                          const int32_t *qmat, int avail, int pos4x4,
                          int cat);
static int cabac_cbp(Ctx &s, BitReader &r, int avail);
static int cabac_qp_delta(Ctx &s, BitReader &r);
static int cabac_intra4x4_pred_mode(Ctx &s, BitReader &r, int pa, int pb);
static int cabac_intra_chroma_pred_mode(Ctx &s, BitReader &r, int avail);
static int cabac_transform8x8_flag(Ctx &s, BitReader &r, int avail);

static int residual_block_any(Ctx &s, BitReader &r, int na, int nb,
                              int32_t *coeff, const int32_t *qmat, int cat,
                              int pos4x4, int avail) {
    int cnum;
    if (s.sp.is_cabac) {
        cnum = cabac_residual(s, r, coeff, qmat, avail, pos4x4, cat);
        return cnum;
    }
    cnum = cavlc_residual(s, r, na, nb, coeff, qmat, cat);
    if (cnum > 0)
        s.cbf |= (uint32_t)(cat == 5 ? 0xF : 1) << pos4x4;
    return cnum;
}

static int read_cbp_any(Ctx &s, BitReader &r, int avail, int inter) {
    if (s.sp.is_cabac) return cabac_cbp(s, r, avail);
    return read_me_cbp(r, inter);
}

static int read_qp_delta_any(Ctx &s, BitReader &r) {
    if (s.sp.is_cabac) return cabac_qp_delta(s, r);
    return read_qp_delta_cavlc(s, r);
}

static int read_intra_pred_mode_any(Ctx &s, BitReader &r, int pa, int pb) {
    if (s.sp.is_cabac) return cabac_intra4x4_pred_mode(s, r, pa, pb);
    int p = pa < pb ? pa : pb;
    if (!r.get1()) {
        int rem = r.get(3);
        p = rem < p ? rem : rem + 1;
    }
    return p;
}

static int read_chroma_mode_any(Ctx &s, BitReader &r, int avail_intra) {
    int mode;
    if (s.sp.is_cabac) {
        mode = cabac_intra_chroma_pred_mode(s, r, avail_intra);
    } else {
        mode = r.ue();
        mode = (mode >= 0 && mode <= 3) ? mode : 0;
        s.chroma_pred_mode = mode;
    }
    return mode;
}

static int read_transform8x8_any(Ctx &s, BitReader &r, int avail) {
    if (s.sp.is_cabac) return cabac_transform8x8_flag(s, r, avail);
    return r.get1();
}

// ---------------------------------------------------------------------
// MB layer dispatch (intra kinds; inter added in later stages)
// ---------------------------------------------------------------------
static int mb_inter_dispatch(Ctx &s, BitReader &r, int mbtype, int avail);

static int mb_dispatch(Ctx &s, BitReader &r, int mbtype, int avail) {
    if (mbtype == MB_INxN) {
        if (s.sp.t8x8_mode) {
            if (read_transform8x8_any(s, r, avail))
                return mb_intra8x8(s, r, avail);
            return mb_intra4x4(s, r, avail);
        }
        return mb_intra4x4(s, r, avail);
    }
    if (mbtype < MB_IPCM) return mb_intra16x16(s, r, mbtype, avail);
    if (mbtype == MB_IPCM) return mb_intrapcm(s, r);
    return mb_inter_dispatch(s, r, mbtype, avail);
}

static int macroblock_layer(Ctx &s, BitReader &r) {
    int mbtype = r.ue();
    if (mbtype < 0) return -2;
    int st = s.sp.slice_type;
    if (st == P_SLICE) {
        mbtype -= 5;
        if (mbtype < 0) mbtype += MB_PSKIP;
    } else if (st == B_SLICE) {
        mbtype -= 23;
        if (mbtype < 0) mbtype += 23 + MB_PSKIP;
    }
    s.mb_type = mbtype;
    int avail = get_avail(s);
    return mb_dispatch(s, r, mbtype, avail);
}

// ---------------------------------------------------------------------
// slice data loop (slice_data, h264.cpp:10210-10251)
// ---------------------------------------------------------------------
static int skip_mbs(Ctx &s, int skip_num);  // inter stage
static int slice_data_cabac(Ctx &s, BitReader &r);

static int slice_data(Ctx &s, BitReader &r) {
    if (s.sp.is_cabac) return slice_data_cabac(s, r);
    for (;;) {
        if (s.sp.slice_type != I_SLICE) {
            int skip_num = r.ue();
            if (skip_num < 0) return -2;
            if (skip_num) {
                int e = skip_mbs(s, skip_num);
                if (e == -1) break;
                if (e < -1) return e;
            }
            if (!r.more_rbsp_data()) break;
        }
        int e = macroblock_layer(s, r);
        if (e < 0) return e;
        s.mbleft.mb_skip = 0;
        top_of(s).mb_skip = 0;
        if (increment_mb_pos(s) < 0) break;
        if (!r.more_rbsp_data()) break;
    }
    return 0;
}

}  // namespace

// ---------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------
extern "C" {

void *h264p_new(int max_x, int max_y) {
    Ctx *s = new Ctx();
    memset(s, 0, sizeof(Ctx));
    s->max_x = max_x;
    s->max_y = max_y;
    s->nmb = max_x * max_y;
    s->top_pred = new int32_t[max_x * 4]();
    s->top_coef = new int32_t[max_x * 8]();
    s->mbtop = new PrevMb[max_x + 2]();
    return s;
}

void h264p_free(void *ctx) {
    Ctx *s = (Ctx *)ctx;
    delete[] s->top_pred;
    delete[] s->top_coef;
    delete[] s->mbtop;
    delete s;
}

void h264p_begin_picture(void *ctx, void **plan_ptrs) {
    Ctx *s = (Ctx *)ctx;
    PlanPtrs &p = s->plan;
    int i = 0;
    p.kind = (int32_t *)plan_ptrs[i++];
    p.t8x8 = (int32_t *)plan_ptrs[i++];
    p.coef_luma = (int32_t *)plan_ptrs[i++];
    p.coef_chroma = (int32_t *)plan_ptrs[i++];
    p.i4_modes = (int32_t *)plan_ptrs[i++];
    p.i4_avail = (int32_t *)plan_ptrs[i++];
    p.i8_modes = (int32_t *)plan_ptrs[i++];
    p.i8_avail = (int32_t *)plan_ptrs[i++];
    p.i16_mode = (int32_t *)plan_ptrs[i++];
    p.chroma_mode = (int32_t *)plan_ptrs[i++];
    p.mb_avail = (int32_t *)plan_ptrs[i++];
    p.mv = (int32_t *)plan_ptrs[i++];
    p.slot = (int32_t *)plan_ptrs[i++];
    p.wp = (int32_t *)plan_ptrs[i++];
    p.pcm = (uint8_t *)plan_ptrs[i++];
    p.deb_idc = (int32_t *)plan_ptrs[i++];
    p.deb_qpy = (int32_t *)plan_ptrs[i++];
    p.deb_qpc = (int32_t *)plan_ptrs[i++];
    p.deb_slicehdr = (int32_t *)plan_ptrs[i++];
    p.deb_str4 = (int32_t *)plan_ptrs[i++];
    p.deb_str = (int64_t *)plan_ptrs[i++];
    s->curr_type = (int32_t *)plan_ptrs[i++];
    s->curr_ref = (int32_t *)plan_ptrs[i++];
    s->curr_mv = (int32_t *)plan_ptrs[i++];
}

void h264p_set_refs(void *ctx, const int32_t *refs /* [2][16][4] */,
                    const int32_t *col_type, const int32_t *col_ref,
                    const int32_t *col_mv, const int32_t *col_map,
                    const int32_t *map_col_to_list0 /* [16] */,
                    const int32_t *scale_tab /* [16] */,
                    const int32_t *wtab /* [2][32][3][2] */,
                    const int32_t *wshift /* [2] */,
                    const int32_t *implicit_w /* [32][32][2] */) {
    Ctx *s = (Ctx *)ctx;
    for (int lx = 0; lx < 2; lx++)
        for (int k = 0; k < 16; k++) {
            const int32_t *e = refs + (lx * 16 + k) * 4;
            s->refs[lx][k].frame_idx = e[0];
            s->refs[lx][k].poc = e[1];
            s->refs[lx][k].in_use = e[2];
            s->refs[lx][k].col_idx = e[3];
        }
    s->col_type = col_type;
    s->col_ref = col_ref;
    s->col_mv = col_mv;
    s->col_map = col_map;
    if (map_col_to_list0)
        memcpy(s->map_col_to_list0, map_col_to_list0, 16 * sizeof(int32_t));
    if (scale_tab) memcpy(s->scale_tab, scale_tab, 16 * sizeof(int32_t));
    if (wtab) memcpy(s->wtab, wtab, sizeof(s->wtab));
    if (wshift) { s->wshift[0] = wshift[0]; s->wshift[1] = wshift[1]; }
    if (implicit_w) memcpy(s->implicit_w, implicit_w, sizeof(s->implicit_w));
}

/* Returns 0 ok / negative error; out_state = {mb_pos, mb_x, mb_y,
 * firstline} after the slice. */
int h264p_slice(void *ctx, const uint8_t *payload, int64_t nbytes,
                const SliceParams *sp, int32_t *out_state) {
    Ctx *s = (Ctx *)ctx;
    s->sp = *sp;
    set_mb_pos(*s, sp->first_mb);
    set_qp(*s, sp->qp);
    s->plan.deb_slicehdr[sp->first_mb * 2] = sp->alpha_ofs;
    s->plan.deb_slicehdr[sp->first_mb * 2 + 1] = sp->beta_ofs;
    s->plan.deb_idc[sp->first_mb] = sp->deb_idc_plus1;
    BitReader r;
    r.init(payload, nbytes, sp->bit_offset);
    int e = slice_data(*s, r);
    out_state[0] = s->mb_pos;
    out_state[1] = s->mb_x;
    out_state[2] = s->mb_y;
    out_state[3] = s->firstline;
    return e;
}

}  // extern "C"

namespace {
// placeholder stubs (replaced by the inter/CABAC stages)
static int mb_inter_dispatch(Ctx &, BitReader &, int, int) { return -9; }
static int skip_mbs(Ctx &, int) { return -9; }
static int slice_data_cabac(Ctx &, BitReader &) { return -9; }
static int cabac_residual(Ctx &, BitReader &, int32_t *, const int32_t *,
                          int, int, int) { return -9; }
static int cabac_cbp(Ctx &, BitReader &, int) { return -9; }
static int cabac_qp_delta(Ctx &, BitReader &) { return -9; }
static int cabac_intra4x4_pred_mode(Ctx &, BitReader &, int, int) {
    return -9;
}
static int cabac_intra_chroma_pred_mode(Ctx &, BitReader &, int) {
    return -9;
}
static int cabac_transform8x8_flag(Ctx &, BitReader &, int) { return -9; }
}  // namespace
