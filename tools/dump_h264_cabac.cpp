/* Dump the reference's CABAC context-init (m,n) tables
 * (ctx_idx_mn_IPB, h264vld.h:485) to JSON for table generation. */
#include <cstdio>
#include <cstdint>
typedef struct { int8_t m; int8_t n; } m2d_cabac_init_mn_t;
#define static_assert(...)  /* keep includes simple */
namespace tbl {
#include "h264vld_tables_only.h"
}
int main() {
    printf("{\"ctx_idx_mn_IPB\": [");
    for (int i = 0; i < 4; ++i) {
        printf(i ? ",[" : "[");
        for (int j = 0; j < 460; ++j)
            printf("%s[%d,%d]", j ? "," : "",
                   tbl::ctx_idx_mn_IPB[i][j].m, tbl::ctx_idx_mn_IPB[i][j].n);
        printf("]");
    }
    printf("]}\n");
    return 0;
}
