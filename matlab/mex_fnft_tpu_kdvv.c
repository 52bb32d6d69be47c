/* mex_fnft_tpu_kdvv.c — MATLAB/Octave gateway for the forward NFT of the
 * Korteweg-de Vries equation with vanishing boundaries.
 *
 *   contspec = mex_fnft_tpu_kdvv(q, T, XI, ...)
 *   [contspec, bound_states] = mex_fnft_tpu_kdvv(q, T, XI, ...)
 *
 * Protocol-compatible with the reference gateway (matlab/mex_fnft_kdvv.m,
 * which exposes no option strings); 'M', 'quiet' and 'discr_*' are
 * fnft-tpu extensions, as is the second output (the reference library has
 * KdV bound states "not yet implemented", src/fnft_kdvv.c:87-92).
 */
#include "mex_fnft_tpu_common.h"

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[])
{
    char msg[256];
    mexopts_t opts;
    size_t d, m, kcap, k;
    double t[2], xi[2];
    int kk, rc;
    fnft_tpu_complex *q = NULL, *contspec = NULL, *bound_states = NULL;

    if (nrhs < 3)
        mexErrMsgTxt("At least three inputs expected.");
    if (!mxIsComplex(prhs[0]) || mxGetM(prhs[0]) != 1)
        mexErrMsgTxt("First input q should be a complex row vector. "
                     "Try passing complex(q).");
    if (!mex_is_rvec2(prhs[1]))
        mexErrMsgTxt("Second input T should be a double 1x2 vector.");
    if (!mex_is_rvec2(prhs[2]))
        mexErrMsgTxt("Third input XI should be a double 1x2 vector.");

    d = mxGetNumberOfElements(prhs[0]);
    m = d;
    t[0] = mxGetPr(prhs[1])[0];
    t[1] = mxGetPr(prhs[1])[1];
    xi[0] = mxGetPr(prhs[2])[0];
    xi[1] = mxGetPr(prhs[2])[1];

    if (d < 2)
        mexErrMsgTxt("Length of the first input q should be at least two.");
    if (t[0] >= t[1])
        mexErrMsgTxt("T(1) >= T(2).");
    if (xi[0] >= xi[1])
        mexErrMsgTxt("XI(1) >= XI(2).");

    mexopts_init(&opts);

    for (kk = 3; kk < nrhs; kk++) {
        char *str = mex_opt_string(prhs[kk], kk, msg, sizeof msg);

        if (strcmp(str, "M") == 0) {
            m = (size_t)mex_opt_scalar(kk, nrhs, prhs, "M", msg, sizeof msg);
            kk++;
        } else if (strcmp(str, "quiet") == 0) {
            mexopts_bool(&opts, "quiet", 1);
        } else if (mex_discr_apply(str, &opts)) {
            /* handled */
        } else {
            mxFree(str);
            mex_fail_unknown(kk, msg, sizeof msg);
        }
        mxFree(str);
    }

    kcap = nlhs >= 2 ? d : 0;

    q = mxMalloc(d * sizeof *q);
    contspec = mxMalloc(m * sizeof *contspec);
    if (kcap > 0)
        bound_states = mxMalloc(kcap * sizeof *bound_states);
    if (q == NULL || contspec == NULL || (kcap > 0 && bound_states == NULL))
        mexErrMsgTxt("Out of memory.");

    mex_get_cvec(prhs[0], q, d);

    k = kcap;
    rc = fnft_tpu_kdvv(d, q, t, m, contspec, xi, kcap > 0 ? &k : NULL,
                       bound_states, mexopts_json(&opts));
    if (rc != 0)
        mex_fail_rc("fnft_tpu_kdvv", rc, msg, sizeof msg);

    plhs[0] = mex_new_cvec(contspec, m);
    if (nlhs >= 2)
        plhs[1] = mex_new_cvec(bound_states, k);

    mxFree(q);
    mxFree(contspec);
    mxFree(bound_states);
}
