/* Behavioral dump of the reference's H.265 residual-coding tables
 * (h265tbl.h sig-coeff tables, h265.cpp scan orders + last_sig params)
 * to JSON. Includes the reference TU (tables are file-static). */
#include <cstdio>
#include "h265.cpp"

static void arr(const int8_t* p, int n) {
    printf("[");
    for (int i = 0; i < n; ++i) printf("%s%d", i ? "," : "", p[i]);
    printf("]");
}

int main() {
    printf("{\"last_sig_coef_param\":[");
    for (int c = 0; c < 2; ++c) {
        if (c) printf(",");
        arr(last_sig_coef_param[c], 4);
    }
    printf("],\n\"sig_inc_ofset\":[");
    for (int o = 0; o < 3; ++o) {
        if (o) printf(",");
        printf("[");
        for (int c = 0; c < 2; ++c) {
            if (c) printf(",");
            arr(sig_coeff_flag_inc_ofset[o][c], 4);
        }
        printf("]");
    }
    printf("],\n\"sig_inc_tblidx\":[");
    for (int o = 0; o < 3; ++o) {
        if (o) printf(",");
        printf("[");
        for (int c = 0; c < 2; ++c) {
            if (c) printf(",");
            printf("[");
            for (int s = 0; s < 4; ++s) {
                if (s) printf(",");
                printf("[");
                for (int z = 0; z < 2; ++z) {
                    if (z) printf(",");
                    arr(sig_coeff_flag_inc_tblidx[o][c][s][z], 4);
                }
                printf("]");
            }
            printf("]");
        }
        printf("]");
    }
    int ntbl = sizeof(sig_coeff_flag_inc_tbl) / 16;
    printf("],\n\"sig_inc_tbl\":[");
    for (int i = 0; i < ntbl; ++i) {
        if (i) printf(",");
        arr(sig_coeff_flag_inc_tbl[i], 16);
    }
    printf("],\n\"scan_order\":[");
    for (int o = 0; o < 3; ++o) {
        if (o) printf(",");
        printf("[");
        for (int s = 0; s < 4; ++s) {
            if (s) printf(",");
            int n2 = (1 << s) * (1 << s);
            int blk = n2 < 4 ? 4 : n2;  /* tables are at least 2x2 */
            printf("{\"sub_block_num\":");
            arr(residual_scan_order[o][s].sub_block_num, blk);
            printf(",\"sub_block_pos\":");
            arr(residual_scan_order[o][s].sub_block_pos, blk);
            printf(",\"macro_xy_pos\":");
            arr(residual_scan_order[o][s].macro_xy_pos, 16);
            printf("}");
        }
        printf("]");
    }
    printf("],\n\"inner_inv\":[");
    for (int o = 0; o < 3; ++o) {
        if (o) printf(",");
        arr(residual_scan_order_inner_inv[o], 16);
    }
    printf("]}\n");
    return 0;
}
