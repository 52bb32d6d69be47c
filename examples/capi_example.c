/* The reference quickstart (examples/fnft_nsev_example.c:29-118) against
 * the fnft-tpu C API: rectangular pulse q = 2 on T = [-1, 1], D = 256,
 * M = 8 xi samples, focusing. One soliton at ~1.572i.
 *
 * Build (after `python -m fnft_tpu.capi.build`):
 *   gcc capi_example.c -I../fnft_tpu/capi -L../fnft_tpu/capi \
 *       -lfnft_tpu -Wl,-rpath,../fnft_tpu/capi -o capi_example
 */
#include <complex.h>
#include <stdio.h>

#include "fnft_tpu.h"

int main(void) {
    enum { D = 256, M = 8, KMAX = 8 };
    fnft_tpu_complex q[D], contspec[M], bound_states[KMAX],
        normconsts[KMAX];
    double t[2] = {-1.0, 1.0}, xi[2] = {-2.0, 2.0};
    size_t k = KMAX;

    uint32_t maj, min, pat;
    char suffix[32];
    if (fnft_tpu_version(&maj, &min, &pat, suffix) != 0) {
        fprintf(stderr, "version: %s\n", fnft_tpu_last_error());
        return 1;
    }
    printf("fnft_tpu %u.%u.%u%s\n", maj, min, pat, suffix);

    for (int i = 0; i < D; i++)
        q[i] = 2.0 + 0.0 * I;

    int rc = fnft_tpu_nsev(D, q, t, M, contspec, xi, &k, bound_states,
                           normconsts, +1, NULL);
    if (rc != 0) {
        fprintf(stderr, "fnft_tpu_nsev rc=%d: %s\n", rc,
                fnft_tpu_last_error());
        return rc;
    }

    printf("continuous spectrum:\n");
    for (int i = 0; i < M; i++)
        printf("  rho(%+.3f) = %+.6f %+.6fI\n",
               xi[0] + i * (xi[1] - xi[0]) / (M - 1),
               creal(contspec[i]), cimag(contspec[i]));
    printf("discrete spectrum (K = %zu):\n", k);
    for (size_t i = 0; i < k; i++)
        printf("  lambda = %+.6f %+.6fI, b = %+.6f %+.6fI\n",
               creal(bound_states[i]), cimag(bound_states[i]),
               creal(normconsts[i]), cimag(normconsts[i]));
    return 0;
}
