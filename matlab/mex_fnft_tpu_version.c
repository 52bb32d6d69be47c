/* mex_fnft_tpu_version.c — library version.
 *
 *   [major, minor, patch, suffix] = mex_fnft_tpu_version()
 *
 * Mirrors the reference's mex_fnft_version (matlab/mex_fnft_version.c);
 * the suffix identifies the fnft-tpu build providing parity with that
 * reference version.
 */
#include "mex_fnft_tpu_common.h"

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[])
{
    char msg[256];
    char suffix[32];
    uint32_t major = 0, minor = 0, patch = 0;
    int rc;

    (void)nrhs;
    (void)prhs;

    rc = fnft_tpu_version(&major, &minor, &patch, suffix);
    if (rc != 0)
        mex_fail_rc("fnft_tpu_version", rc, msg, sizeof msg);

    plhs[0] = mxCreateDoubleMatrix(1, 1, mxREAL);
    mxGetPr(plhs[0])[0] = (double)major;
    if (nlhs >= 2) {
        plhs[1] = mxCreateDoubleMatrix(1, 1, mxREAL);
        mxGetPr(plhs[1])[0] = (double)minor;
    }
    if (nlhs >= 3) {
        plhs[2] = mxCreateDoubleMatrix(1, 1, mxREAL);
        mxGetPr(plhs[2])[0] = (double)patch;
    }
    if (nlhs >= 4)
        plhs[3] = mxCreateString(suffix);
}
