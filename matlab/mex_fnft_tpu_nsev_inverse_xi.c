/* mex_fnft_tpu_nsev_inverse_xi.c — canonical spectral grid for the inverse
 * NFT.
 *
 *   [XI, xi_grid] = mex_fnft_tpu_nsev_inverse_xi(D, T, M, ...)
 *
 * Protocol-compatible with the reference's mex_fnft_nsev_inverse_XI
 * (matlab/mex_fnft_nsev_inverse_XI.c:25-78); accepts an optional
 * 'discr_*' token (the reference hardwires the default discretization).
 */
#include "mex_fnft_tpu_common.h"

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[])
{
    char msg[256];
    mexopts_t opts;
    size_t d, m, i;
    double t[2], xi[2];
    int kk, rc;

    if (nlhs < 1)
        return;

    if (nrhs < 3)
        mexErrMsgTxt("At least three inputs expected.");
    if (!mex_is_scalar(prhs[0]))
        mexErrMsgTxt("First input D should be a scalar.");
    if (!mex_is_rvec2(prhs[1]))
        mexErrMsgTxt("Second input T should be a double 1x2 vector.");
    if (!mex_is_scalar(prhs[2]))
        mexErrMsgTxt("Third input M should be a scalar.");

    d = (size_t)mxGetScalar(prhs[0]);
    t[0] = mxGetPr(prhs[1])[0];
    t[1] = mxGetPr(prhs[1])[1];
    m = (size_t)mxGetScalar(prhs[2]);

    mexopts_init(&opts);
    for (kk = 3; kk < nrhs; kk++) {
        char *str = mex_opt_string(prhs[kk], kk, msg, sizeof msg);
        if (!mex_discr_apply(str, &opts)) {
            mxFree(str);
            mex_fail_unknown(kk, msg, sizeof msg);
        }
        mxFree(str);
    }

    rc = fnft_tpu_nsev_inverse_xi(d, t, m, xi, mexopts_json(&opts));
    if (rc != 0)
        mex_fail_rc("fnft_tpu_nsev_inverse_xi", rc, msg, sizeof msg);

    plhs[0] = mxCreateDoubleMatrix(1, 2, mxREAL);
    mxGetPr(plhs[0])[0] = xi[0];
    mxGetPr(plhs[0])[1] = xi[1];

    if (nlhs >= 2) {
        const double eps_xi = (xi[1] - xi[0]) / (double)(m - 1);
        plhs[1] = mxCreateDoubleMatrix(1, (int)m, mxREAL);
        for (i = 0; i < m; i++)
            mxGetPr(plhs[1])[i] = xi[0] + (double)i * eps_xi;
    }
}
