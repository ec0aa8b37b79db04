/* Dump the reference decoder's MPEG-2 VLC tables to JSON, by driving its own
 * table-walk logic over every possible bit pattern.
 *
 * The output (tests/data/mpeg2_vlc_ref.json) is a TEST FIXTURE used to
 * cross-validate m2dec_tpu's spec-derived Python tables — it is not part of
 * the framework. Links against the reference library sources
 * (/root/reference/src/lib; reference vld.h tables + m2d_dec_vld_unary).
 */
#include <stdio.h>
#include <string.h>
#include "bitio.h"
#include "m2d.h"
#include "mpeg2.h"
#include "vld.h"

extern "C" int m2d_dec_vld_unary(dec_bits *stream, const vlc_t *vld_tab, int bitlen);

static unsigned char buf[16];

static int fail_refill(void *) { return -1; }

/* Feed `nbits` bits (MSB-first in `pattern`) followed by 1-padding, decode one
 * symbol, report (value, consumed). Returns 0 on longjmp (invalid code). */
static int try_decode(const vlc_t *tab, int bitlen, unsigned pattern, int nbits,
                      int *value, int *consumed) {
    memset(buf, 0xff, sizeof(buf));
    for (int i = 0; i < nbits; ++i) {
        int bit = (pattern >> (nbits - 1 - i)) & 1;
        if (!bit) buf[i >> 3] &= ~(0x80 >> (i & 7));
    }
    dec_bits stream;
    dec_bits_open(&stream, 0);
    dec_bits_set_callback(&stream, fail_refill, 0);
    dec_bits_set_data(&stream, buf, sizeof(buf), 0);
    if (setjmp(stream.jmp) != 0) return 0;
    *value = m2d_dec_vld_unary(&stream, tab, bitlen);
    *consumed = (int)((stream.buf_ - buf) * 8 - stream.cache_len_);
    return 1;
}

/* Enumerate canonical codes: for len in 1..maxlen, for each pattern, decode
 * with padding of ones; a code of length L is detected when both 0-padded and
 * 1-padded tails give same value & consumed==L. Simpler: decode pattern of
 * exactly len bits twice with opposite padding. */
static void dump_table(FILE *f, const char *name, const vlc_t *tab, int bitlen, int maxlen) {
    fprintf(f, "  \"%s\": [\n", name);
    int first = 1;
    for (int len = 1; len <= maxlen; ++len) {
        for (unsigned p = 0; p < (1u << len); ++p) {
            int v1, c1, v0, c0;
            /* pad with ones */
            int ok1 = try_decode(tab, bitlen, p, len, &v1, &c1);
            /* pad with zeros: append 8 zero bits */
            int ok0 = try_decode(tab, bitlen, p << 8, len + 8, &v0, &c0);
            if (ok1 && ok0 && c1 == len && c0 == len && v1 == v0) {
                /* exclude if it is a longer-code prefix decoded short?
                   c==len for both paddings means code completes at len. Also
                   skip entries already emitted as shorter codes. */
                if (len > 1) {
                    int vs, cs;
                    /* if some prefix of p already decodes fully, skip */
                    int is_ext = 0;
                    for (int pl = 1; pl < len; ++pl) {
                        unsigned pp = p >> (len - pl);
                        int okp = try_decode(tab, bitlen, (pp << 8) | 0xff, pl + 8, &vs, &cs);
                        if (okp && cs == pl) { is_ext = 1; break; }
                    }
                    if (is_ext) continue;
                }
                if (!first) fprintf(f, ",\n");
                first = 0;
                fprintf(f, "    {\"code\": \"");
                for (int i = len - 1; i >= 0; --i) fputc('0' + ((p >> i) & 1), f);
                fprintf(f, "\", \"value\": %d}", v1);
            }
        }
    }
    fprintf(f, "\n  ]");
}

/* DCT coefficient table walk, replicating parse_coef's lookup
 * (reference mpeg2.cpp:1020-1097) on a vlc_dct_t table. */
static int try_decode_dct(const vlc_dct_t *vld_tab, unsigned pattern, int nbits,
                          int *run, int *level, int *consumed) {
    memset(buf, 0xff, sizeof(buf));
    for (int i = 0; i < nbits; ++i) {
        int bit = (pattern >> (nbits - 1 - i)) & 1;
        if (!bit) buf[i >> 3] &= ~(0x80 >> (i & 7));
    }
    dec_bits stream;
    dec_bits_open(&stream, 0);
    dec_bits_set_callback(&stream, fail_refill, 0);
    dec_bits_set_data(&stream, buf, sizeof(buf), 0);
    if (setjmp(stream.jmp) != 0) return 0;
    int rest_len = VLD_BITLEN;
    int bit = show_bits(&stream, rest_len);
    const vlc_dct_t *cur = vld_tab;
    const vlc_dct_t *vlc = &cur[bit];
    int len = vlc->length;
    while (len <= 0) {
        if (len < 0) return 0;
        cur += vlc->run;
        skip_bits(&stream, rest_len);
        rest_len = vlc->level < VLD_BITLEN ? vlc->level : VLD_BITLEN;
        bit = show_bits(&stream, rest_len);
        vlc = &cur[bit];
        len = vlc->length;
    }
    skip_bits(&stream, len);
    *run = vlc->run;
    *level = vlc->level;
    *consumed = (int)((stream.buf_ - buf) * 8 - stream.cache_len_);
    return 1;
}

static void dump_dct_table(FILE *f, const char *name, const vlc_dct_t *tab, int maxlen) {
    fprintf(f, "  \"%s\": [\n", name);
    int first = 1;
    for (int len = 1; len <= maxlen; ++len) {
        for (unsigned p = 0; p < (1u << len); ++p) {
            int r1, l1, c1, r0, l0, c0;
            int ok1 = try_decode_dct(tab, p, len, &r1, &l1, &c1);
            int ok0 = try_decode_dct(tab, p << 8, len + 8, &r0, &l0, &c0);
            if (ok1 && ok0 && c1 == len && c0 == len && r1 == r0 && l1 == l0) {
                int is_ext = 0;
                for (int pl = 1; pl < len; ++pl) {
                    unsigned pp = p >> (len - pl);
                    int rs, ls, cs;
                    int okp = try_decode_dct(tab, (pp << 8) | 0xff, pl + 8, &rs, &ls, &cs);
                    if (okp && cs == pl) { is_ext = 1; break; }
                }
                if (is_ext) continue;
                if (!first) fprintf(f, ",\n");
                first = 0;
                fprintf(f, "    {\"code\": \"");
                for (int i = len - 1; i >= 0; --i) fputc('0' + ((p >> i) & 1), f);
                /* run<0 && level!=0 => EOB; run<0 && level==0 => ESC */
                fprintf(f, "\", \"run\": %d, \"level\": %d}", r1, l1);
            }
        }
    }
    fprintf(f, "\n  ]");
}

int main(int argc, char **argv) {
    FILE *f = stdout;
    if (argc > 1) f = fopen(argv[1], "w");
    fprintf(f, "{\n");
    dump_table(f, "mb_inc", mb_inc_bit4, 4, 11);
    fprintf(f, ",\n");
    dump_table(f, "mb_type_p", mb_type_p_bit3, 3, 6);
    fprintf(f, ",\n");
    dump_table(f, "mb_type_b", mb_type_b_bit4, 4, 6);
    fprintf(f, ",\n");
    dump_table(f, "cbp", coded_block_pattern_bit5, 5, 9);
    fprintf(f, ",\n");
    dump_table(f, "motion_code", motion_code_bit5, 5, 11);
    fprintf(f, ",\n");
    dump_table(f, "dct_dc_size_luma", dct_dc_size_luma_bit5, 5, 9);
    fprintf(f, ",\n");
    dump_table(f, "dct_dc_size_chroma", dct_dc_size_chroma_bit4, 4, 10);
    fprintf(f, ",\n");
    dump_dct_table(f, "dct_table0", m2d_dct_table0_bit7, 17);
    fprintf(f, ",\n");
    dump_dct_table(f, "dct_table1", m2d_dct_table1_bit7, 17);
    fprintf(f, "\n}\n");
    if (f != stdout) fclose(f);
    return 0;
}
