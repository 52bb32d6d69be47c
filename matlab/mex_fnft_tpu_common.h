/* mex_fnft_tpu_common.h — shared plumbing of the fnft-tpu MEX gateways.
 *
 * The gateways honor the reference FNFT library's MATLAB string-option
 * protocol (matlab/mex_fnft_nsev.m:17-113 and friends) but are built on a
 * different mechanism: instead of mutating a C options struct through a
 * long if/else chain, each recognized token is looked up in a small table
 * and appended to the JSON options string that libfnft_tpu.so consumes.
 * Unknown tokens raise the reference's exact "...th input has invalid
 * value." error so MATLAB scripts behave identically.
 *
 * Complex data uses the classic separate-storage mx API (mxGetPr/mxGetPi).
 * Under MATLAB R2018a+ compile with `mex -R2017b ...` (see
 * make_fnft_tpu.m); GNU Octave's mkoctfile --mex supports it natively.
 */
#ifndef MEX_FNFT_TPU_COMMON_H
#define MEX_FNFT_TPU_COMMON_H

#include <complex.h>
#include <ctype.h>
#include <stdio.h>
#include <string.h>

#include "mex.h"

#include "fnft_tpu.h"

/* ------------------------------------------------------------------ *
 * JSON options accumulator                                            *
 * ------------------------------------------------------------------ */

typedef struct {
    char buf[16384];
    size_t len;
    int n;       /* number of key/value pairs emitted */
    int err;     /* sticky overflow flag */
} mexopts_t;

static void mexopts_init(mexopts_t *o) {
    o->len = 1;
    o->n = 0;
    o->err = 0;
    o->buf[0] = '{';
    o->buf[1] = '\0';
}

/* Append `"key": rawval` (rawval is already valid JSON). */
static void mexopts_raw(mexopts_t *o, const char *key, const char *rawval) {
    int w = snprintf(o->buf + o->len, sizeof o->buf - o->len,
                     "%s\"%s\": %s", o->n ? ", " : "", key, rawval);
    if (w < 0 || (size_t)w >= sizeof o->buf - o->len) {
        o->err = 1;
        return;
    }
    o->len += (size_t)w;
    o->n++;
}

static void mexopts_str(mexopts_t *o, const char *key, const char *val) {
    char tmp[96];
    snprintf(tmp, sizeof tmp, "\"%s\"", val);
    mexopts_raw(o, key, tmp);
}

static void mexopts_num(mexopts_t *o, const char *key, double v) {
    char tmp[64];
    snprintf(tmp, sizeof tmp, "%.17g", v);
    mexopts_raw(o, key, tmp);
}

static void mexopts_bool(mexopts_t *o, const char *key, int v) {
    mexopts_raw(o, key, v ? "true" : "false");
}

/* `"key": [[re, im], ...]` — complex vector riding inside the options
 * (used for 'bsloc_newton' initial guesses). */
static void mexopts_cvec(mexopts_t *o, const char *key, const double *re,
                         const double *im, size_t n) {
    size_t i;
    int w = snprintf(o->buf + o->len, sizeof o->buf - o->len,
                     "%s\"%s\": [", o->n ? ", " : "", key);
    if (w < 0 || (size_t)w >= sizeof o->buf - o->len) {
        o->err = 1;
        return;
    }
    o->len += (size_t)w;
    for (i = 0; i < n; i++) {
        w = snprintf(o->buf + o->len, sizeof o->buf - o->len,
                     "%s[%.17g, %.17g]", i ? ", " : "",
                     re[i], im ? im[i] : 0.0);
        if (w < 0 || (size_t)w >= sizeof o->buf - o->len) {
            o->err = 1;
            return;
        }
        o->len += (size_t)w;
    }
    if (o->len + 1 >= sizeof o->buf) {
        o->err = 1;
        return;
    }
    o->buf[o->len++] = ']';
    o->buf[o->len] = '\0';
    o->n++;
}

static void mexopts_dvec(mexopts_t *o, const char *key, const double *v,
                         size_t n) {
    char tmp[512];
    size_t i, len = 0;
    tmp[len++] = '[';
    for (i = 0; i < n && len + 40 < sizeof tmp; i++)
        len += (size_t)snprintf(tmp + len, sizeof tmp - len, "%s%.17g",
                                i ? ", " : "", v[i]);
    tmp[len++] = ']';
    tmp[len] = '\0';
    mexopts_raw(o, key, tmp);
}

/* Finalized JSON string (valid until the next append). */
static const char *mexopts_json(mexopts_t *o) {
    if (o->err || o->len + 1 >= sizeof o->buf)
        mexErrMsgTxt("Options too long.");
    o->buf[o->len] = '}';
    o->buf[o->len + 1] = '\0';
    return o->buf;
}

/* ------------------------------------------------------------------ *
 * Option-token tables                                                 *
 * ------------------------------------------------------------------ */

/* A flag token sets one JSON key to a fixed raw value. */
typedef struct {
    const char *token;
    const char *key;
    const char *rawval;
} mexflag_t;

/* A scalar token consumes the next (double scalar) argument. */
typedef struct {
    const char *token;
    const char *key; /* NULL: caller handles the value (e.g. 'M') */
} mexscalar_t;

static int mexflag_apply(const mexflag_t *table, const char *tok,
                         mexopts_t *o) {
    for (; table->token; table++) {
        if (strcmp(tok, table->token) == 0) {
            mexopts_raw(o, table->key, table->rawval);
            return 1;
        }
    }
    return 0;
}

/* 'discr_<NAME>' tokens map onto the Discretization enum by lowercasing
 * the suffix ('discr_2split4B' -> "2split4b"); 'discr_modal' is the
 * reference spelling of 2split2_modal. Every discretization the framework
 * implements is therefore reachable without per-scheme table entries. */
static int mex_discr_apply(const char *tok, mexopts_t *o) {
    char val[40];
    size_t i;
    if (strncmp(tok, "discr_", 6) != 0)
        return 0;
    if (strcmp(tok, "discr_modal") == 0) {
        mexopts_str(o, "discretization", "2split2_modal");
        return 1;
    }
    for (i = 0; tok[6 + i] && i + 1 < sizeof val; i++)
        val[i] = (char)tolower((unsigned char)tok[6 + i]);
    val[i] = '\0';
    mexopts_str(o, "discretization", val);
    return 1;
}

/* ------------------------------------------------------------------ *
 * mxArray input/output helpers                                        *
 * ------------------------------------------------------------------ */

static int mex_is_rvec2(const mxArray *a) {
    return mxIsDouble(a) && mxGetM(a) == 1 && mxGetN(a) == 2;
}

static int mex_is_scalar(const mxArray *a) {
    return mxIsDouble(a) && mxGetNumberOfElements(a) == 1;
}

/* Copy a (possibly real-only) double row vector into complex storage. */
static void mex_get_cvec(const mxArray *a, fnft_tpu_complex *dst, size_t n) {
    const double *re = mxGetPr(a);
    const double *im = mxIsComplex(a) ? mxGetPi(a) : NULL;
    size_t i;
    for (i = 0; i < n; i++)
        dst[i] = re[i] + (im ? im[i] : 0.0) * I;
}

/* New 1xN complex matrix from complex storage. */
static mxArray *mex_new_cvec(const fnft_tpu_complex *src, size_t n) {
    mxArray *a = mxCreateDoubleMatrix(1, (int)n, mxCOMPLEX);
    double *re = mxGetPr(a);
    double *im = mxGetPi(a);
    size_t i;
    for (i = 0; i < n; i++) {
        re[i] = creal(src[i]);
        im[i] = cimag(src[i]);
    }
    return a;
}

/* Current option string (errors with the reference's message shape). */
static char *mex_opt_string(const mxArray *a, int argpos, char *msg,
                            size_t msglen) {
    char *str;
    if (!mxIsChar(a)) {
        snprintf(msg, msglen, "%dth input should be a string.", argpos + 1);
        mexErrMsgTxt(msg);
    }
    str = mxArrayToString(a);
    if (str == NULL)
        mexErrMsgTxt("Out of memory.");
    return str;
}

/* Scalar value following a scalar-consuming token. */
static double mex_opt_scalar(int k, int nrhs, const mxArray *prhs[],
                             const char *tok, char *msg, size_t msglen) {
    if (k + 1 >= nrhs || !mex_is_scalar(prhs[k + 1])
            || mxGetScalar(prhs[k + 1]) < 0.0) {
        snprintf(msg, msglen,
                 "'%s' should be followed by a non-negative real scalar.",
                 tok);
        mexErrMsgTxt(msg);
    }
    return mxGetScalar(prhs[k + 1]);
}

static void mex_fail_unknown(int argpos, char *msg, size_t msglen) {
    snprintf(msg, msglen, "%dth input has invalid value.", argpos + 1);
    mexErrMsgTxt(msg);
}

/* Driver failure -> MATLAB error with the library's last message. */
static void mex_fail_rc(const char *fn, int rc, char *msg, size_t msglen) {
    snprintf(msg, msglen, "%s failed (error code %d): %s", fn, rc,
             fnft_tpu_last_error());
    mexErrMsgTxt(msg);
}

#endif /* MEX_FNFT_TPU_COMMON_H */
