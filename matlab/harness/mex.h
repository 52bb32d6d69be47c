/* mex.h — minimal MEX API shim for exercising the fnft-tpu gateways
 * without a MATLAB/Octave installation.
 *
 * Implements exactly the subset of the classic (separate-complex) mx/mex
 * API that the mex_fnft_tpu_*.c gateways use, with MATLAB semantics:
 * mxGetPi returns NULL for real arrays, mexErrMsgTxt does not return
 * (longjmp to the harness, or exit(1) when no handler is armed).
 *
 * This header is ONLY for the self-test harness (harness_main.c); real
 * MATLAB/Octave builds use the vendor mex.h via make_fnft_tpu.m.
 */
#ifndef MEX_SHIM_H
#define MEX_SHIM_H

#include <setjmp.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct mxArray_tag {
    size_t m, n;
    double *pr;
    double *pi_; /* NULL for real arrays */
    char *str;   /* non-NULL for char arrays */
} mxArray;

typedef enum { mxREAL = 0, mxCOMPLEX = 1 } mxComplexity;

int mxIsComplex(const mxArray *a);
int mxIsDouble(const mxArray *a);
int mxIsChar(const mxArray *a);
size_t mxGetM(const mxArray *a);
size_t mxGetN(const mxArray *a);
size_t mxGetNumberOfElements(const mxArray *a);
double mxGetScalar(const mxArray *a);
double *mxGetPr(const mxArray *a);
double *mxGetPi(const mxArray *a);
char *mxArrayToString(const mxArray *a);
void *mxMalloc(size_t nbytes);
void mxFree(void *p);
mxArray *mxCreateDoubleMatrix(size_t m, size_t n, mxComplexity flag);
mxArray *mxCreateString(const char *s);

void mexErrMsgTxt(const char *msg);
int mexPrintf(const char *fmt, ...);

/* harness plumbing: armed by harness_main before calling mexFunction */
extern jmp_buf mex_shim_jmp;
extern int mex_shim_jmp_armed;
extern char mex_shim_errmsg[1024];

void mexFunction(int nlhs, mxArray *plhs[], int nrhs, const mxArray *prhs[]);

#ifdef __cplusplus
}
#endif

#endif /* MEX_SHIM_H */
