/* Dump the reference's H.264 CAVLC tables to JSON by driving its table
 * mechanics over every bit pattern (test fixture; see dump_vlc_tables.cpp).
 *
 * coeff_token tables (total_ones_nc*) and total_zeros1 use the chained
 * m2d_dec_vld_unary walk; the other total_zeros / run_before / level_prefix
 * tables are direct show_bits lookups of {pattern, length}.
 */
#include <stdio.h>
#include <string.h>
#include <assert.h>
#include "bitio.h"
#include "m2d.h"
#include "h264vld.h"

extern "C" int m2d_dec_vld_unary(dec_bits *stream, const vlc_t *vld_tab, int bitlen);

static unsigned char buf[16];
static int fail_refill(void *) { return -1; }

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

static void dump_unary_table(FILE *f, const char *name, const vlc_t *tab, int bitlen, int maxlen) {
    fprintf(f, "  \"%s\": [\n", name);
    int first = 1;
    for (int len = 1; len <= maxlen; ++len) {
        for (unsigned p = 0; p < (1u << len); ++p) {
            int v1, c1, v0, c0;
            int ok1 = try_decode(tab, bitlen, p, len, &v1, &c1);
            int ok0 = try_decode(tab, bitlen, p << 8, len + 8, &v0, &c0);
            if (ok1 && ok0 && c1 == len && c0 == len && v1 == v0) {
                int is_ext = 0;
                for (int pl = 1; pl < len; ++pl) {
                    int vs, cs;
                    unsigned pp = p >> (len - pl);
                    int okp = try_decode(tab, bitlen, (pp << 8) | 0xff, pl + 8, &vs, &cs);
                    if (okp && cs == pl) { is_ext = 1; break; }
                }
                if (is_ext) continue;
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

/* direct show_bits(n) -> {pattern, length} table */
static void dump_direct_table(FILE *f, const char *name, const vlc_t *tab, int showbits) {
    fprintf(f, "  \"%s\": [\n", name);
    int first = 1;
    for (unsigned p = 0; p < (1u << showbits); ++p) {
        int len = tab[p].length;
        int val = tab[p].pattern;
        if (len <= 0 || len > showbits) continue;
        /* canonical entry: pattern's low bits beyond len must not matter;
           emit only when the suffix is all-ones to dedup */
        unsigned suffix_mask = (1u << (showbits - len)) - 1;
        if ((p & suffix_mask) != suffix_mask) continue;
        if (!first) fprintf(f, ",\n");
        first = 0;
        fprintf(f, "    {\"code\": \"");
        for (int i = showbits - 1; i >= showbits - len; --i) fputc('0' + ((p >> i) & 1), f);
        fprintf(f, "\", \"value\": %d}", val);
    }
    fprintf(f, "\n  ]");
}

int main(int argc, char **argv) {
    FILE *f = stdout;
    if (argc > 1) f = fopen(argv[1], "w");
    fprintf(f, "{\n");
    dump_unary_table(f, "coeff_token_nc02", total_ones_nc02_bit6, 6, 16);
    fprintf(f, ",\n");
    dump_unary_table(f, "coeff_token_nc24", total_ones_nc24_bit6, 6, 14);
    fprintf(f, ",\n");
    dump_unary_table(f, "coeff_token_nc48", total_ones_nc48_bit6, 6, 10);
    fprintf(f, ",\n");
    dump_unary_table(f, "coeff_token_nc8", total_ones_nc8_bit6, 6, 6);
    fprintf(f, ",\n");
    dump_unary_table(f, "coeff_token_chroma", total_ones_nc_chroma_bit6, 6, 8);
    fprintf(f, ",\n");
    dump_unary_table(f, "total_zeros_1", total_zeros1_bit6, 6, 9);
    fprintf(f, ",\n");
    dump_direct_table(f, "level_prefix8", level_prefix_bit8, 8);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_2", total_zeros2_bit6, 6);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_3", total_zeros3_bit6, 6);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_4", total_zeros4_bit5, 5);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_5", total_zeros5_bit5, 5);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_6", total_zeros6_bit6, 6);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_7", total_zeros7_bit6, 6);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_8", total_zeros8_bit6, 6);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_9", total_zeros9_bit6, 6);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_10", total_zeros10_bit5, 5);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_11", total_zeros11_bit4, 4);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_12", total_zeros12_bit4, 4);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_13", total_zeros13_bit3, 3);
    fprintf(f, ",\n");
    dump_direct_table(f, "total_zeros_14", total_zeros14_bit2, 2);
    fprintf(f, ",\n");
    dump_direct_table(f, "run_before_2", run_before_2_bit2, 2);
    fprintf(f, ",\n");
    dump_direct_table(f, "run_before_4", run_before_4_bit3, 3);
    fprintf(f, ",\n");
    dump_direct_table(f, "run_before_5", run_before_5_bit3, 3);
    fprintf(f, ",\n");
    dump_direct_table(f, "run_before_6", run_before_6_bit3, 3);
    fprintf(f, ",\n");
    dump_unary_table(f, "run_before_7", run_before_7_bit3, 3, 11);
    fprintf(f, "\n}\n");
    if (f != stdout) fclose(f);
    return 0;
}
