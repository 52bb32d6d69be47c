/* mex_fnft_tpu_nsev.c — MATLAB/Octave gateway for the forward NFT of the
 * vanishing nonlinear Schroedinger equation.
 *
 *   [contspec, bound_states, normconsts] = ...
 *       mex_fnft_tpu_nsev(q, T, XI, kappa, ...)
 *
 * Protocol-compatible with the reference FNFT gateway
 * (matlab/mex_fnft_nsev.m:17-113): same positional arguments, same option
 * strings, same output layout. Implemented over libfnft_tpu.so's
 * JSON-options C API (see mex_fnft_tpu_common.h for the mechanism).
 */
#include "mex_fnft_tpu_common.h"

static const mexflag_t NSEV_FLAGS[] = {
    {"bsloc_fasteigen", "bound_state_localization", "\"fast_eigenvalue\""},
    {"bsloc_subsamp_refine", "bound_state_localization",
     "\"subsample_and_refine\""},
    {"bsfilt_none", "bound_state_filtering", "\"none\""},
    {"bsfilt_basic", "bound_state_filtering", "\"basic\""},
    {"bsfilt_full", "bound_state_filtering", "\"full\""},
    {"cstype_ab", "contspec_type", "\"ab\""},
    {"dstype_residues", "discspec_type", "\"residues\""},
    {"RE", "richardson_extrapolation", "true"},
    {"quiet", "quiet", "true"},
    {NULL, NULL, NULL},
};

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[])
{
    char msg[256];
    mexopts_t opts;
    size_t d, m, k, kcap, csmult = 1;
    double t[2], xi[2];
    int kappa, kk;
    int skip_cs = 0, skip_bs = 0, skip_nc = 0;
    fnft_tpu_complex *q = NULL, *contspec = NULL;
    fnft_tpu_complex *bound_states = NULL, *normconsts = NULL;
    int rc;

    if (nlhs < 2)
        skip_bs = 1;
    if (nlhs < 3)
        skip_nc = 1;

    if (nrhs < 4)
        mexErrMsgTxt("At least four inputs expected.");
    if (!mxIsComplex(prhs[0]) || mxGetM(prhs[0]) != 1)
        mexErrMsgTxt("First input q should be a complex row vector. "
                     "Try passing complex(q).");
    if (!mex_is_rvec2(prhs[1]))
        mexErrMsgTxt("Second input T should be a double 1x2 vector.");
    if (!mex_is_rvec2(prhs[2]))
        mexErrMsgTxt("Third input XI should be a double 1x2 vector.");
    if (!mex_is_scalar(prhs[3]))
        mexErrMsgTxt("Fourth input kappa should be a scalar.");

    d = mxGetNumberOfElements(prhs[0]);
    m = d;
    kcap = d;
    t[0] = mxGetPr(prhs[1])[0];
    t[1] = mxGetPr(prhs[1])[1];
    xi[0] = mxGetPr(prhs[2])[0];
    xi[1] = mxGetPr(prhs[2])[1];
    kappa = (int)mxGetScalar(prhs[3]);

    if (d < 2)
        mexErrMsgTxt("Length of the first input q should be at least two.");
    if (t[0] >= t[1])
        mexErrMsgTxt("T(1) >= T(2).");
    if (xi[0] >= xi[1])
        mexErrMsgTxt("XI(1) >= XI(2).");
    if (kappa != +1 && kappa != -1)
        mexErrMsgTxt("Fourth input kappa should be +1.0 or -1.0.");

    mexopts_init(&opts);

    for (kk = 4; kk < nrhs; kk++) {
        char *str = mex_opt_string(prhs[kk], kk, msg, sizeof msg);

        if (strcmp(str, "M") == 0) {
            m = (size_t)mex_opt_scalar(kk, nrhs, prhs, "M", msg, sizeof msg);
            kk++;
        } else if (strcmp(str, "bsloc_niter") == 0) {
            mexopts_num(&opts, "niter",
                        mex_opt_scalar(kk, nrhs, prhs, str, msg, sizeof msg));
            kk++;
        } else if (strcmp(str, "bsloc_Dsub") == 0) {
            mexopts_num(&opts, "dsub",
                        mex_opt_scalar(kk, nrhs, prhs, str, msg, sizeof msg));
            kk++;
        } else if (strcmp(str, "bsloc_newton") == 0) {
            if (kk + 1 >= nrhs || !mxIsComplex(prhs[kk + 1])
                    || mxGetM(prhs[kk + 1]) != 1
                    || mxGetN(prhs[kk + 1]) < 1) {
                mxFree(str);
                mexErrMsgTxt("'bsloc_newton' should be followed by a "
                             "complex row vector of initial guesses for "
                             "Newton's method. Try passing complex(...).");
            }
            kcap = mxGetN(prhs[kk + 1]);
            mexopts_raw(&opts, "bound_state_localization", "\"newton\"");
            mexopts_cvec(&opts, "initial_states", mxGetPr(prhs[kk + 1]),
                         mxGetPi(prhs[kk + 1]), kcap);
            kk++;
        } else if (strcmp(str, "skip_cs") == 0) {
            skip_cs = 1;
        } else if (strcmp(str, "skip_bs") == 0) {
            skip_bs = 1;
            skip_nc = 1; /* norming constants need the bound states */
        } else if (strcmp(str, "skip_nc") == 0) {
            skip_nc = 1;
        } else if (strcmp(str, "cstype_ab") == 0) {
            csmult = 2;
            mexopts_raw(&opts, "contspec_type", "\"ab\"");
        } else if (mexflag_apply(NSEV_FLAGS, str, &opts)
                   || mex_discr_apply(str, &opts)) {
            /* handled by the tables */
        } else {
            mxFree(str);
            mex_fail_unknown(kk, msg, sizeof msg);
        }
        mxFree(str);
    }

    if (skip_cs)
        m = 0;
    if (skip_bs)
        mexopts_bool(&opts, "want_bound_states", 0);

    q = mxMalloc(d * sizeof *q);
    if (m > 0)
        contspec = mxMalloc(csmult * m * sizeof *contspec);
    if (!skip_bs) {
        bound_states = mxMalloc(kcap * sizeof *bound_states);
        normconsts = mxMalloc(kcap * sizeof *normconsts);
    }
    if (q == NULL || (m > 0 && contspec == NULL)
            || (!skip_bs && (bound_states == NULL || normconsts == NULL)))
        mexErrMsgTxt("Out of memory.");

    mex_get_cvec(prhs[0], q, d);

    k = skip_bs ? 0 : kcap;
    rc = fnft_tpu_nsev(d, q, t, m, contspec, xi, &k, bound_states,
                       normconsts, kappa, mexopts_json(&opts));
    if (rc != 0)
        mex_fail_rc("fnft_tpu_nsev", rc, msg, sizeof msg);

    plhs[0] = m > 0 ? mex_new_cvec(contspec, csmult * m)
                    : mxCreateDoubleMatrix(0, 0, mxCOMPLEX);
    if (nlhs >= 2)
        plhs[1] = skip_bs ? mxCreateDoubleMatrix(0, 0, mxCOMPLEX)
                          : mex_new_cvec(bound_states, k);
    if (nlhs >= 3)
        plhs[2] = skip_nc ? mxCreateDoubleMatrix(0, 0, mxCOMPLEX)
                          : mex_new_cvec(normconsts, k);

    mxFree(q);
    mxFree(contspec);
    mxFree(bound_states);
    mxFree(normconsts);
}
