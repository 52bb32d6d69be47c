/* mex_fnft_tpu_nsep.c — MATLAB/Octave gateway for the forward NFT of the
 * (quasi-)periodic nonlinear Schroedinger equation.
 *
 *   [main_spec, aux_spec] = mex_fnft_tpu_nsep(q, T, kappa, ...)
 *
 * Protocol-compatible with the reference gateway
 * (matlab/mex_fnft_nsep.m:17-70); built on libfnft_tpu.so (see
 * mex_fnft_tpu_common.h).
 */
#include "mex_fnft_tpu_common.h"

static const mexflag_t NSEP_FLAGS[] = {
    {"loc_mixed", "localization", "\"mixed\""},
    {"loc_subsample_and_refine", "localization", "\"subsample_and_refine\""},
    {"loc_gridsearch", "localization", "\"gridsearch\""},
    {"filt_none", "filtering", "\"none\""},
    {"quiet", "quiet", "true"},
    {NULL, NULL, NULL},
};

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[])
{
    char msg[256];
    mexopts_t opts;
    size_t d, kcap, mcap, kfound, mfound;
    double t[2], phase_shift = 0.0;
    int kappa, kk, rc;
    fnft_tpu_complex *q = NULL, *main_spec = NULL, *aux_spec = NULL;

    (void)nlhs;

    if (nrhs < 3)
        mexErrMsgTxt("At least three inputs expected.");
    if (!mxIsComplex(prhs[0]) || mxGetM(prhs[0]) != 1)
        mexErrMsgTxt("First input q should be a complex row vector. "
                     "Try passing complex(q).");
    if (!mex_is_rvec2(prhs[1]))
        mexErrMsgTxt("Second input T should be a double 1x2 vector.");
    if (!mex_is_scalar(prhs[2]))
        mexErrMsgTxt("Third input kappa should be a scalar.");

    d = mxGetNumberOfElements(prhs[0]);
    t[0] = mxGetPr(prhs[1])[0];
    t[1] = mxGetPr(prhs[1])[1];
    kappa = (int)mxGetScalar(prhs[2]);

    if (d < 2 || (d & (d - 1)) != 0)
        mexErrMsgTxt("Length of the first input q should be >=2 and a "
                     "power of two.");
    if (t[0] >= t[1])
        mexErrMsgTxt("T(1) >= T(2).");
    if (kappa != +1 && kappa != -1)
        mexErrMsgTxt("Third input kappa should be +1.0 or -1.0.");

    mexopts_init(&opts);

    for (kk = 3; kk < nrhs; kk++) {
        char *str = mex_opt_string(prhs[kk], kk, msg, sizeof msg);

        if (strcmp(str, "phase_shift") == 0) {
            if (kk + 1 >= nrhs || !mex_is_scalar(prhs[kk + 1])) {
                mxFree(str);
                mexErrMsgTxt("'phase_shift' should be followed by a real "
                             "scalar.");
            }
            phase_shift = mxGetScalar(prhs[kk + 1]);
            kk++;
        } else if (strcmp(str, "loc_max_evals") == 0) {
            mexopts_num(&opts, "max_evals",
                        mex_opt_scalar(kk, nrhs, prhs, str, msg, sizeof msg));
            kk++;
        } else if (strcmp(str, "loc_Dsub") == 0) {
            mexopts_num(&opts, "dsub",
                        mex_opt_scalar(kk, nrhs, prhs, str, msg, sizeof msg));
            kk++;
        } else if (strcmp(str, "points_per_spine") == 0) {
            mexopts_num(&opts, "points_per_spine",
                        mex_opt_scalar(kk, nrhs, prhs, str, msg, sizeof msg));
            kk++;
        } else if (strcmp(str, "filt_manual") == 0) {
            if (kk + 1 >= nrhs || !mxIsDouble(prhs[kk + 1])
                    || mxGetM(prhs[kk + 1]) != 1
                    || mxGetN(prhs[kk + 1]) != 4) {
                mxFree(str);
                mexErrMsgTxt("'filt_manual' should be followed by a real "
                             "row vector of length four. See the help.");
            }
            mexopts_raw(&opts, "filtering", "\"manual\"");
            mexopts_dvec(&opts, "bounding_box", mxGetPr(prhs[kk + 1]), 4);
            kk++;
        } else if (mexflag_apply(NSEP_FLAGS, str, &opts)
                   || mex_discr_apply(str, &opts)) {
            /* handled by the tables */
        } else {
            mxFree(str);
            mex_fail_unknown(kk, msg, sizeof msg);
        }
        mxFree(str);
    }

    /* capacity follows the reference's sizing: the main spectrum holds at
     * most ~2.5 eigenvalues per degree of freedom, the aux spectrum ~1
     * (mex_fnft_nsep.c uses K=D, M=D before the call) */
    kcap = 4 * d;
    mcap = 2 * d;

    q = mxMalloc(d * sizeof *q);
    main_spec = mxMalloc(kcap * sizeof *main_spec);
    aux_spec = mxMalloc(mcap * sizeof *aux_spec);
    if (q == NULL || main_spec == NULL || aux_spec == NULL)
        mexErrMsgTxt("Out of memory.");

    mex_get_cvec(prhs[0], q, d);

    kfound = kcap;
    mfound = mcap;
    rc = fnft_tpu_nsep(d, q, t, phase_shift, &kfound, main_spec, &mfound,
                       aux_spec, NULL, kappa, mexopts_json(&opts));
    if (rc != 0)
        mex_fail_rc("fnft_tpu_nsep", rc, msg, sizeof msg);

    plhs[0] = mex_new_cvec(main_spec, kfound);
    if (nlhs >= 2)
        plhs[1] = mex_new_cvec(aux_spec, mfound);

    mxFree(q);
    mxFree(main_spec);
    mxFree(aux_spec);
}
