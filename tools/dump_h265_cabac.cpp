/* Dump the reference's H.265 CABAC context-init (m,n) table
 * (cabac_initial_value, h265.cpp:941) to JSON for table generation.
 * Includes the reference TU directly since the table is file-static. */
#include <cstdio>
#include "h265.cpp"

int main() {
    printf("{\"cabac_initial_value\": [");
    for (int i = 0; i < 3; ++i) {
        printf(i ? ",[" : "[");
        for (int j = 0; j < 157; ++j)
            printf("%s[%d,%d]", j ? "," : "",
                   cabac_initial_value[i][j].m, cabac_initial_value[i][j].n);
        printf("]");
    }
    printf("]}\n");
    return 0;
}
