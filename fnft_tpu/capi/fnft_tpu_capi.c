/* fnft_tpu_capi.c — C ABI of the fnft-tpu framework.
 *
 * Thin embedding layer: each driver marshals its buffers as bytes into
 * fnft_tpu.capi.adapter (pure CPython stable-ish ABI: PyBytes, numbers),
 * which runs the JAX implementation. See fnft_tpu.h for the contract.
 *
 * Build: python -m fnft_tpu.capi.build   (gcc -shared, links libpython)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "fnft_tpu.h"

#ifndef FNFT_TPU_DEFAULT_PYTHON
#define FNFT_TPU_DEFAULT_PYTHON "python3"
#endif
#ifndef FNFT_TPU_DEFAULT_PKG_ROOT
#define FNFT_TPU_DEFAULT_PKG_ROOT "."
#endif

static char g_last_error[1024] = "";
static int g_path_done = 0;

static void set_error(const char *msg) {
    snprintf(g_last_error, sizeof g_last_error, "%s", msg ? msg : "?");
}

const char *fnft_tpu_last_error(void) { return g_last_error; }

static void set_error_from_python(void) {
    PyObject *type = NULL, *value = NULL, *tb = NULL;
    PyErr_Fetch(&type, &value, &tb);
    if (value) {
        PyObject *s = PyObject_Str(value);
        if (s) {
            const char *msg = PyUnicode_AsUTF8(s);
            set_error(msg ? msg : "python error");
            Py_DECREF(s);
        }
    } else {
        set_error("unknown python error");
    }
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
}

/* Initialize the embedded interpreter (no-op when the host process is
 * already Python, e.g. the library is loaded via ctypes). */
static int ensure_python(void) {
    if (Py_IsInitialized())
        return 0;
    PyConfig config;
    PyConfig_InitPythonConfig(&config);
    const char *exe = getenv("FNFT_TPU_PYTHON");
    if (!exe)
        exe = FNFT_TPU_DEFAULT_PYTHON;
    /* Setting the executable makes getpath honor the venv's pyvenv.cfg,
     * so the venv's site-packages (jax etc.) are importable. */
    PyStatus st = PyConfig_SetBytesString(&config, &config.executable, exe);
    if (!PyStatus_Exception(st))
        st = Py_InitializeFromConfig(&config);
    PyConfig_Clear(&config);
    if (PyStatus_Exception(st)) {
        set_error(st.err_msg ? st.err_msg : "Py_InitializeFromConfig failed");
        return 3;
    }
    /* Drop the GIL acquired by initialization; every API call takes it
     * back via PyGILState_Ensure. */
    PyEval_SaveThread();
    return 0;
}

static void ensure_pkg_path(void) {
    if (g_path_done)
        return;
    const char *root = getenv("FNFT_TPU_PKG_ROOT");
    if (!root)
        root = FNFT_TPU_DEFAULT_PKG_ROOT;
    PyObject *sys_path = PySys_GetObject("path"); /* borrowed */
    PyObject *s = sys_path ? PyUnicode_FromString(root) : NULL;
    if (s) {
        PyList_Insert(sys_path, 0, s);
        Py_DECREF(s);
    }
    g_path_done = 1;
}

/* Call fnft_tpu.capi.adapter.<fn>(*args); returns a new reference or
 * NULL with g_last_error set. */
static PyObject *call_adapter(const char *fn, PyObject *args) {
    PyObject *mod = PyImport_ImportModule("fnft_tpu.capi.adapter");
    if (!mod) {
        set_error_from_python();
        return NULL;
    }
    PyObject *f = PyObject_GetAttrString(mod, fn);
    Py_DECREF(mod);
    if (!f) {
        set_error_from_python();
        return NULL;
    }
    PyObject *res = PyObject_CallObject(f, args);
    Py_DECREF(f);
    if (!res)
        set_error_from_python();
    return res;
}

static int tuple_long(PyObject *t, Py_ssize_t i, long long *out) {
    PyObject *o = PyTuple_GetItem(t, i); /* borrowed */
    if (!o)
        return -1;
    *out = PyLong_AsLongLong(o);
    return PyErr_Occurred() ? -1 : 0;
}

/* Copy tuple item i (bytes, possibly empty or None) into dst. */
static int tuple_bytes_out(PyObject *t, Py_ssize_t i, void *dst,
                           size_t cap) {
    PyObject *o = PyTuple_GetItem(t, i); /* borrowed */
    if (!o)
        return -1;
    if (o == Py_None || !PyBytes_Check(o))
        return o == Py_None ? 0 : -1;
    char *buf;
    Py_ssize_t len;
    if (PyBytes_AsStringAndSize(o, &buf, &len) < 0)
        return -1;
    if (dst && len > 0)
        memcpy(dst, buf, (size_t)len <= cap ? (size_t)len : cap);
    return 0;
}

static void tuple_error_out(PyObject *t, Py_ssize_t i) {
    PyObject *o = PyTuple_GetItem(t, i);
    const char *msg = o && PyUnicode_Check(o) ? PyUnicode_AsUTF8(o) : NULL;
    if (msg && msg[0])
        set_error(msg);
}

#define API_PROLOGUE()                      \
    do {                                    \
        int _rc = ensure_python();          \
        if (_rc)                            \
            return _rc;                     \
    } while (0);                            \
    PyGILState_STATE _gil = PyGILState_Ensure(); \
    ensure_pkg_path();

#define API_EPILOGUE() PyGILState_Release(_gil)

int fnft_tpu_version(uint32_t *major, uint32_t *minor, uint32_t *patch,
                     char suffix[32]) {
    API_PROLOGUE();
    int rc = 2;
    PyObject *res = call_adapter("version", NULL);
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 4) {
        long long a, b, c;
        if (!tuple_long(res, 0, &a) && !tuple_long(res, 1, &b)
                && !tuple_long(res, 2, &c)) {
            if (major) *major = (uint32_t)a;
            if (minor) *minor = (uint32_t)b;
            if (patch) *patch = (uint32_t)c;
            if (suffix) {
                PyObject *s = PyTuple_GetItem(res, 3);
                const char *u = s ? PyUnicode_AsUTF8(s) : NULL;
                snprintf(suffix, 32, "%s", u ? u : "");
            }
            rc = 0;
        }
    }
    Py_XDECREF(res);
    API_EPILOGUE();
    return rc;
}

int fnft_tpu_nsev(size_t d, const fnft_tpu_complex *q, const double t[2],
                  size_t m, fnft_tpu_complex *contspec, const double xi[2],
                  size_t *k_ptr, fnft_tpu_complex *bound_states,
                  fnft_tpu_complex *normconsts_or_residues, int32_t kappa,
                  const char *opts_json) {
    if (!q || !t || (m > 0 && (!contspec || !xi))) {
        set_error("fnft_tpu_nsev: NULL required argument");
        return 1;
    }
    size_t kcap = k_ptr ? *k_ptr : 0;
    API_PROLOGUE();
    int rc = 2;
    PyObject *args = Py_BuildValue(
        "(y#nddnddniz)", (const char *)q, (Py_ssize_t)(d * sizeof *q),
        (Py_ssize_t)d, t[0], t[1], (Py_ssize_t)m,
        xi ? xi[0] : 0.0, xi ? xi[1] : 0.0, (Py_ssize_t)kcap, (int)kappa,
        opts_json);
    PyObject *res = args ? call_adapter("nsev", args) : NULL;
    Py_XDECREF(args);
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 6) {
        long long prc = 2, k = 0;
        if (!tuple_long(res, 0, &prc) && !tuple_long(res, 2, &k)) {
            rc = (int)prc;
            if (rc == 0) {
                /* contspec carries M/2M/3M entries per cstype; the caller
                 * sized it accordingly (reference layout). */
                tuple_bytes_out(res, 1, contspec,
                                3 * m * sizeof *contspec);
                if (k_ptr)
                    *k_ptr = (size_t)k;
                tuple_bytes_out(res, 3, bound_states,
                                kcap * sizeof *bound_states);
                tuple_bytes_out(res, 4, normconsts_or_residues,
                                2 * kcap * sizeof *normconsts_or_residues);
            } else {
                tuple_error_out(res, 5);
            }
        }
    }
    Py_XDECREF(res);
    API_EPILOGUE();
    return rc;
}

int fnft_tpu_kdvv(size_t d, const fnft_tpu_complex *u, const double t[2],
                  size_t m, fnft_tpu_complex *contspec, const double xi[2],
                  size_t *k_ptr, fnft_tpu_complex *bound_states,
                  const char *opts_json) {
    if (!u || !t || !contspec || !xi) {
        set_error("fnft_tpu_kdvv: NULL required argument");
        return 1;
    }
    size_t kcap = k_ptr ? *k_ptr : 0;
    API_PROLOGUE();
    int rc = 2;
    PyObject *args = Py_BuildValue(
        "(y#nddnddnz)", (const char *)u, (Py_ssize_t)(d * sizeof *u),
        (Py_ssize_t)d, t[0], t[1], (Py_ssize_t)m, xi[0], xi[1],
        (Py_ssize_t)kcap, opts_json);
    PyObject *res = args ? call_adapter("kdvv", args) : NULL;
    Py_XDECREF(args);
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 5) {
        long long prc = 2, k = 0;
        if (!tuple_long(res, 0, &prc) && !tuple_long(res, 2, &k)) {
            rc = (int)prc;
            if (rc == 0) {
                tuple_bytes_out(res, 1, contspec, m * sizeof *contspec);
                if (k_ptr)
                    *k_ptr = (size_t)k;
                tuple_bytes_out(res, 3, bound_states,
                                kcap * sizeof *bound_states);
            } else {
                tuple_error_out(res, 4);
            }
        }
    }
    Py_XDECREF(res);
    API_EPILOGUE();
    return rc;
}

int fnft_tpu_nsep(size_t d, const fnft_tpu_complex *q, const double t[2],
                  double phase_shift, size_t *k_ptr,
                  fnft_tpu_complex *main_spec, size_t *m_ptr,
                  fnft_tpu_complex *aux_spec, double *sheet_indices,
                  int32_t kappa, const char *opts_json) {
    if (!q || !t || !k_ptr || !m_ptr) {
        set_error("fnft_tpu_nsep: NULL required argument");
        return 1;
    }
    if (sheet_indices) {
        /* same status as the reference: fnft_nsep.h:251 */
        set_error("fnft_tpu_nsep: sheet_indices not implemented; pass NULL");
        return 1;
    }
    size_t kcap = *k_ptr, mcap = *m_ptr;
    API_PROLOGUE();
    int rc = 2;
    PyObject *args = Py_BuildValue(
        "(y#ndddnniz)", (const char *)q, (Py_ssize_t)(d * sizeof *q),
        (Py_ssize_t)d, t[0], t[1], phase_shift, (Py_ssize_t)kcap,
        (Py_ssize_t)mcap, (int)kappa, opts_json);
    PyObject *res = args ? call_adapter("nsep", args) : NULL;
    Py_XDECREF(args);
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 6) {
        long long prc = 2, km = 0, ka = 0;
        if (!tuple_long(res, 0, &prc) && !tuple_long(res, 1, &km)
                && !tuple_long(res, 3, &ka)) {
            rc = (int)prc;
            if (rc == 0) {
                *k_ptr = (size_t)km;
                *m_ptr = (size_t)ka;
                tuple_bytes_out(res, 2, main_spec,
                                kcap * sizeof *main_spec);
                tuple_bytes_out(res, 4, aux_spec, mcap * sizeof *aux_spec);
            } else {
                tuple_error_out(res, 5);
            }
        }
    }
    Py_XDECREF(res);
    API_EPILOGUE();
    return rc;
}

int fnft_tpu_nsev_inverse_xi(size_t d, const double t[2], size_t m,
                             double xi[2], const char *opts_json) {
    if (!t || !xi) {
        set_error("fnft_tpu_nsev_inverse_xi: NULL required argument");
        return 1;
    }
    API_PROLOGUE();
    int rc = 2;
    PyObject *args = Py_BuildValue("(nddnz)", (Py_ssize_t)d, t[0], t[1],
                                   (Py_ssize_t)m, opts_json);
    PyObject *res = args ? call_adapter("nsev_inverse_xi", args) : NULL;
    Py_XDECREF(args);
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 4) {
        long long prc = 2;
        if (!tuple_long(res, 0, &prc)) {
            rc = (int)prc;
            if (rc == 0) {
                PyObject *a = PyTuple_GetItem(res, 1);
                PyObject *b = PyTuple_GetItem(res, 2);
                xi[0] = a ? PyFloat_AsDouble(a) : 0.0;
                xi[1] = b ? PyFloat_AsDouble(b) : 0.0;
                if (PyErr_Occurred()) {
                    PyErr_Clear();
                    rc = 2;
                }
            } else {
                tuple_error_out(res, 3);
            }
        }
    }
    Py_XDECREF(res);
    API_EPILOGUE();
    return rc;
}

int fnft_tpu_nsev_inverse(size_t m, const fnft_tpu_complex *contspec,
                          const double xi[2], size_t k,
                          const fnft_tpu_complex *bound_states,
                          const fnft_tpu_complex *normconsts_or_residues,
                          size_t d, fnft_tpu_complex *q, const double t[2],
                          int32_t kappa, const char *opts_json) {
    if (!q || !t || (m > 0 && (!contspec || !xi))
            || (k > 0 && (!bound_states || !normconsts_or_residues))) {
        set_error("fnft_tpu_nsev_inverse: NULL required argument");
        return 1;
    }
    API_PROLOGUE();
    int rc = 2;
    /* "y#" must not see a NULL pointer — substitute empty buffers */
    static const char empty[1] = {0};
    const char *cs_p = contspec ? (const char *)contspec : empty;
    const char *bs_p = bound_states ? (const char *)bound_states : empty;
    const char *nc_p = normconsts_or_residues
        ? (const char *)normconsts_or_residues : empty;
    PyObject *args = Py_BuildValue(
        "(y#nddy#y#nnddiz)",
        cs_p, (Py_ssize_t)(contspec ? m * sizeof *contspec : 0),
        (Py_ssize_t)m, xi ? xi[0] : 0.0, xi ? xi[1] : 0.0,
        bs_p, (Py_ssize_t)(bound_states ? k * sizeof *bound_states : 0),
        nc_p, (Py_ssize_t)(normconsts_or_residues
                           ? k * sizeof *normconsts_or_residues : 0),
        (Py_ssize_t)k, (Py_ssize_t)d, t[0], t[1], (int)kappa, opts_json);
    PyObject *res = args ? call_adapter("nsev_inverse", args) : NULL;
    Py_XDECREF(args);
    if (res && PyTuple_Check(res) && PyTuple_Size(res) == 3) {
        long long prc = 2;
        if (!tuple_long(res, 0, &prc)) {
            rc = (int)prc;
            if (rc == 0)
                tuple_bytes_out(res, 1, q, d * sizeof *q);
            else
                tuple_error_out(res, 2);
        }
    }
    Py_XDECREF(res);
    API_EPILOGUE();
    return rc;
}
