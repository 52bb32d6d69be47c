/* harness_main.c — drive a fnft-tpu MEX gateway without MATLAB.
 *
 * Usage: <exe> <specfile> <outprefix>
 *
 * The spec file describes the MATLAB call, one directive per line:
 *   nlhs <n>                 number of requested outputs
 *   cvec <file>              complex row vector (raw interleaved float64)
 *   rvec <file>              real row vector from the same file format
 *   empty                    [] (0x0 complex)
 *   dvec <n> <v1> ... <vn>   real 1xn row vector of literals
 *   scalar <v>               real scalar
 *   str <token>              char array (an option string)
 *   run                      call mexFunction with everything above
 *
 * After `run`, each plhs[i] is written to <outprefix>.<i>.bin as
 * interleaved float64 (re, im) with a one-line <outprefix>.<i>.meta of
 * "<m> <n> <complex|real|string>". mexErrMsgTxt longjmps back here; the
 * message is printed to stderr and the exit code is 1.
 *
 * Together with the mex.h shim in this directory this compiles each
 * gateway into a standalone executable:
 *   gcc harness_main.c ../mex_fnft_tpu_nsev.c -I. -I<capi> -L<capi>
 *       -lfnft_tpu -o nsev_host
 */
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "mex.h"

/* ----------------------------- shim ------------------------------- */

jmp_buf mex_shim_jmp;
int mex_shim_jmp_armed = 0;
char mex_shim_errmsg[1024] = "";

int mxIsComplex(const mxArray *a) { return a->pi_ != NULL; }
int mxIsDouble(const mxArray *a) { return a->str == NULL; }
int mxIsChar(const mxArray *a) { return a->str != NULL; }
size_t mxGetM(const mxArray *a) { return a->m; }
size_t mxGetN(const mxArray *a) { return a->n; }
size_t mxGetNumberOfElements(const mxArray *a) { return a->m * a->n; }
double mxGetScalar(const mxArray *a) { return a->pr ? a->pr[0] : 0.0; }
double *mxGetPr(const mxArray *a) { return a->pr; }
double *mxGetPi(const mxArray *a) { return a->pi_; }

char *mxArrayToString(const mxArray *a) {
    if (!a->str)
        return NULL;
    char *s = malloc(strlen(a->str) + 1);
    if (s)
        strcpy(s, a->str);
    return s;
}

void *mxMalloc(size_t nbytes) { return malloc(nbytes ? nbytes : 1); }
void mxFree(void *p) { free(p); }

mxArray *mxCreateDoubleMatrix(size_t m, size_t n, mxComplexity flag) {
    mxArray *a = calloc(1, sizeof *a);
    if (!a)
        mexErrMsgTxt("shim: out of memory");
    a->m = m;
    a->n = n;
    a->pr = calloc(m * n ? m * n : 1, sizeof(double));
    a->pi_ = flag == mxCOMPLEX ? calloc(m * n ? m * n : 1, sizeof(double))
                               : NULL;
    return a;
}

mxArray *mxCreateString(const char *s) {
    mxArray *a = calloc(1, sizeof *a);
    if (!a)
        mexErrMsgTxt("shim: out of memory");
    a->m = 1;
    a->n = strlen(s);
    a->str = malloc(a->n + 1);
    strcpy(a->str, s);
    return a;
}

void mexErrMsgTxt(const char *msg) {
    snprintf(mex_shim_errmsg, sizeof mex_shim_errmsg, "%s", msg ? msg : "?");
    if (mex_shim_jmp_armed)
        longjmp(mex_shim_jmp, 1);
    fprintf(stderr, "mexErrMsgTxt: %s\n", mex_shim_errmsg);
    exit(1);
}

int mexPrintf(const char *fmt, ...) {
    va_list ap;
    va_start(ap, fmt);
    int r = vprintf(fmt, ap);
    va_end(ap);
    return r;
}

/* --------------------------- spec parser --------------------------- */

#define MAX_ARGS 64

static mxArray *read_vec_file(const char *path, int complex_flag) {
    FILE *f = fopen(path, "rb");
    if (!f) {
        fprintf(stderr, "cannot open %s\n", path);
        exit(2);
    }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    size_t n = (size_t)bytes / (2 * sizeof(double));
    mxArray *a = mxCreateDoubleMatrix(n ? 1 : 0, n,
                                      complex_flag ? mxCOMPLEX : mxREAL);
    size_t i;
    for (i = 0; i < n; i++) {
        double re_im[2];
        if (fread(re_im, sizeof(double), 2, f) != 2) {
            fprintf(stderr, "short read in %s\n", path);
            exit(2);
        }
        a->pr[i] = re_im[0];
        if (complex_flag)
            a->pi_[i] = re_im[1];
    }
    fclose(f);
    return a;
}

static void write_output(const mxArray *a, const char *prefix, int i) {
    char path[1024];
    snprintf(path, sizeof path, "%s.%d.meta", prefix, i);
    FILE *meta = fopen(path, "w");
    if (!meta)
        exit(2);
    fprintf(meta, "%zu %zu %s\n", a->m, a->n,
            a->str ? "string" : (a->pi_ ? "complex" : "real"));
    fclose(meta);

    snprintf(path, sizeof path, "%s.%d.bin", prefix, i);
    FILE *f = fopen(path, "wb");
    if (!f)
        exit(2);
    if (a->str) {
        fwrite(a->str, 1, a->n, f);
    } else {
        size_t j, n = a->m * a->n;
        for (j = 0; j < n; j++) {
            double re_im[2];
            re_im[0] = a->pr[j];
            re_im[1] = a->pi_ ? a->pi_[j] : 0.0;
            fwrite(re_im, sizeof(double), 2, f);
        }
    }
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <specfile> <outprefix>\n", argv[0]);
        return 2;
    }
    FILE *spec = fopen(argv[1], "r");
    if (!spec) {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 2;
    }

    mxArray *prhs[MAX_ARGS] = {0};
    mxArray *plhs[MAX_ARGS] = {0};
    int nrhs = 0, nlhs = 1, i;
    char line[4096];

    while (fgets(line, sizeof line, spec)) {
        char *tok = strtok(line, " \t\r\n");
        if (!tok || tok[0] == '#')
            continue;
        if (nrhs >= MAX_ARGS) {
            fprintf(stderr, "too many inputs\n");
            return 2;
        }
        if (strcmp(tok, "nlhs") == 0) {
            nlhs = atoi(strtok(NULL, " \t\r\n"));
        } else if (strcmp(tok, "cvec") == 0 || strcmp(tok, "rvec") == 0) {
            int cflag = tok[0] == 'c';
            prhs[nrhs++] = read_vec_file(strtok(NULL, " \t\r\n"), cflag);
        } else if (strcmp(tok, "empty") == 0) {
            prhs[nrhs++] = mxCreateDoubleMatrix(0, 0, mxCOMPLEX);
        } else if (strcmp(tok, "dvec") == 0) {
            int n = atoi(strtok(NULL, " \t\r\n")), j;
            mxArray *a = mxCreateDoubleMatrix(1, (size_t)n, mxREAL);
            for (j = 0; j < n; j++)
                a->pr[j] = atof(strtok(NULL, " \t\r\n"));
            prhs[nrhs++] = a;
        } else if (strcmp(tok, "scalar") == 0) {
            mxArray *a = mxCreateDoubleMatrix(1, 1, mxREAL);
            a->pr[0] = atof(strtok(NULL, " \t\r\n"));
            prhs[nrhs++] = a;
        } else if (strcmp(tok, "str") == 0) {
            prhs[nrhs++] = mxCreateString(strtok(NULL, " \t\r\n"));
        } else if (strcmp(tok, "run") == 0) {
            break;
        } else {
            fprintf(stderr, "unknown directive %s\n", tok);
            return 2;
        }
    }
    fclose(spec);

    mex_shim_jmp_armed = 1;
    if (setjmp(mex_shim_jmp)) {
        fprintf(stderr, "mexErrMsgTxt: %s\n", mex_shim_errmsg);
        return 1;
    }
    mexFunction(nlhs, plhs, nrhs, (const mxArray **)prhs);
    mex_shim_jmp_armed = 0;

    for (i = 0; i < nlhs; i++)
        if (plhs[i])
            write_output(plhs[i], argv[2], i);
    return 0;
}
