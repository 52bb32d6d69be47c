/* mex_fnft_tpu_nsev_inverse.c — MATLAB/Octave gateway for the inverse NFT
 * of the vanishing nonlinear Schroedinger equation.
 *
 *   q = mex_fnft_tpu_nsev_inverse(contspec, XI, bound_states, ...
 *                                 normconsts_or_residues, D, T, kappa, ...)
 *
 * Protocol-compatible with the reference gateway
 * (matlab/mex_fnft_nsev_inverse.m:13-70); built on libfnft_tpu.so.
 * Pass [] for contspec (multi-soliton synthesis) or for the discrete
 * spectrum. XI must come from mex_fnft_tpu_nsev_inverse_xi.
 */
#include "mex_fnft_tpu_common.h"

static const mexflag_t INV_FLAGS[] = {
    {"cstype_reflection_coefficient", "contspec_type",
     "\"reflection_coefficient\""},
    {"cstype_b_of_xi", "contspec_type", "\"b_of_xi\""},
    {"cstype_B_of_tau", "contspec_type", "\"b_of_tau\""},
    {"csmethod_tfmatrix_contains_refl_coeff", "contspec_method",
     "\"tf_refl\""},
    {"csmethod_tfmatrix_contains_ab_from_iter", "contspec_method",
     "\"tf_ab_iter\""},
    {"csmethod_use_seed_potential_instead", "contspec_method",
     "\"seed_potential\""},
    {"dstype_residues", "discspec_type", "\"residues\""},
    {"quiet", "quiet", "true"},
    {NULL, NULL, NULL},
};

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[])
{
    char msg[256];
    mexopts_t opts;
    size_t m, k, d;
    double t[2], xi[2];
    int kappa, kk, rc;
    fnft_tpu_complex *contspec = NULL, *bound_states = NULL;
    fnft_tpu_complex *normconsts = NULL, *q = NULL;

    (void)nlhs;

    if (nrhs < 7)
        mexErrMsgTxt("At least seven inputs expected.");

    m = mxGetNumberOfElements(prhs[0]);
    if (m > 0 && (!mxIsComplex(prhs[0]) || mxGetM(prhs[0]) != 1))
        mexErrMsgTxt("First input contspec should be a complex row vector "
                     "or []. Try passing complex(contspec).");
    if (m > 0 && !mex_is_rvec2(prhs[1]))
        mexErrMsgTxt("Second input XI should be a double 1x2 vector.");
    k = mxGetNumberOfElements(prhs[2]);
    if (k > 0 && (!mxIsComplex(prhs[2]) || mxGetM(prhs[2]) != 1))
        mexErrMsgTxt("Third input bound_states should be a complex row "
                     "vector or []. Try passing complex(...).");
    if (k > 0 && (mxGetNumberOfElements(prhs[3]) != k
                  || !mxIsComplex(prhs[3])))
        mexErrMsgTxt("Fourth input normconsts_or_residues should be a "
                     "complex row vector of the same length as "
                     "bound_states. Try passing complex(...).");
    if (!mex_is_scalar(prhs[4]))
        mexErrMsgTxt("Fifth input D should be a scalar.");
    if (!mex_is_rvec2(prhs[5]))
        mexErrMsgTxt("Sixth input T should be a double 1x2 vector.");
    if (!mex_is_scalar(prhs[6]))
        mexErrMsgTxt("Seventh input kappa should be a scalar.");

    d = (size_t)mxGetScalar(prhs[4]);
    t[0] = mxGetPr(prhs[5])[0];
    t[1] = mxGetPr(prhs[5])[1];
    kappa = (int)mxGetScalar(prhs[6]);
    if (m > 0) {
        xi[0] = mxGetPr(prhs[1])[0];
        xi[1] = mxGetPr(prhs[1])[1];
    } else {
        xi[0] = -1.0;
        xi[1] = 1.0;
    }

    if (d < 2 || (d & (d - 1)) != 0)
        mexErrMsgTxt("Fifth input D should be a positive power of two.");
    if (t[0] >= t[1])
        mexErrMsgTxt("T(1) >= T(2).");
    if (kappa != +1 && kappa != -1)
        mexErrMsgTxt("Seventh input kappa should be +1.0 or -1.0.");
    if (m == 0 && k == 0)
        mexErrMsgTxt("Empty contspec and empty discrete spectrum: "
                     "nothing to invert.");

    mexopts_init(&opts);

    for (kk = 7; kk < nrhs; kk++) {
        char *str = mex_opt_string(prhs[kk], kk, msg, sizeof msg);

        if (strcmp(str, "oversampling_factor") == 0) {
            mexopts_num(&opts, "oversampling_factor",
                        mex_opt_scalar(kk, nrhs, prhs, str, msg, sizeof msg));
            kk++;
        } else if (mexflag_apply(INV_FLAGS, str, &opts)
                   || mex_discr_apply(str, &opts)) {
            /* handled by the tables */
        } else {
            mxFree(str);
            mex_fail_unknown(kk, msg, sizeof msg);
        }
        mxFree(str);
    }

    if (m > 0) {
        contspec = mxMalloc(m * sizeof *contspec);
        if (contspec == NULL)
            mexErrMsgTxt("Out of memory.");
        mex_get_cvec(prhs[0], contspec, m);
    }
    if (k > 0) {
        bound_states = mxMalloc(k * sizeof *bound_states);
        normconsts = mxMalloc(k * sizeof *normconsts);
        if (bound_states == NULL || normconsts == NULL)
            mexErrMsgTxt("Out of memory.");
        mex_get_cvec(prhs[2], bound_states, k);
        mex_get_cvec(prhs[3], normconsts, k);
    }
    q = mxMalloc(d * sizeof *q);
    if (q == NULL)
        mexErrMsgTxt("Out of memory.");

    rc = fnft_tpu_nsev_inverse(m, contspec, xi, k, bound_states, normconsts,
                               d, q, t, kappa, mexopts_json(&opts));
    if (rc != 0)
        mex_fail_rc("fnft_tpu_nsev_inverse", rc, msg, sizeof msg);

    plhs[0] = mex_new_cvec(q, d);

    mxFree(contspec);
    mxFree(bound_states);
    mxFree(normconsts);
    mxFree(q);
}
