/* Behavioral dump of the reference's angular intra tables
 * (intrapos.h: intra_pred_pos variable-length rows + intra_pred_coef). */
#include <cstdio>
#include "h265.cpp"

int main() {
    printf("{\"pos\":[");
    for (int m = 0; m < 33; ++m) {
        if (m) printf(",");
        printf("[");
        for (int s = 0; s < 4; ++s) {
            if (s) printf(",");
            const int8_t* t = intra_pred_pos[m][s];
            int extra = t[0];
            int len = 1 + extra + 2;
            printf("[");
            for (int i = 0; i < len; ++i)
                printf("%s%d", i ? "," : "", t[i]);
            printf("]");
        }
        printf("]");
    }
    printf("],\n\"coef\":[");
    for (int m = 0; m < 33; ++m) {
        if (m) printf(",");
        printf("[[");
        for (int i = 0; i < 32; ++i)
            printf("%s%d", i ? "," : "", intra_pred_coef[m][0][i]);
        printf("],[");
        for (int i = 0; i < 32; ++i)
            printf("%s%d", i ? "," : "", intra_pred_coef[m][1][i]);
        printf("]]");
    }
    printf("]}\n");
    return 0;
}
