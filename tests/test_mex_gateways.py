"""MATLAB/Octave MEX gateways (matlab/mex_fnft_tpu_*.c): compile each
gateway against the mex.h shim harness and drive it as a MATLAB caller
would, comparing against the Python drivers.

The shim (matlab/harness/) implements MATLAB semantics for the mx/mex
subset the gateways use, so these tests prove the gateway C sources are
executable and correct without a MATLAB installation; under real
MATLAB/Octave the same sources build via matlab/make_fnft_tpu.m.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

import fnft_tpu as ft

REPO = pathlib.Path(__file__).resolve().parents[1]
MATLAB = REPO / "matlab"

GATEWAYS = ["nsev", "nsep", "kdvv", "nsev_inverse", "nsev_inverse_xi",
            "version"]


@pytest.fixture(scope="module")
def hosts(tmp_path_factory):
    """Compile every gateway into a shim-backed host executable."""
    from fnft_tpu import capi

    if shutil.which("gcc") is None:
        pytest.skip("no C toolchain")
    if not capi.have_capi():
        try:
            subprocess.run([sys.executable, "-m", "fnft_tpu.capi.build"],
                           check=True, capture_output=True, timeout=180)
        except Exception as e:  # pragma: no cover - toolchain-specific
            pytest.skip(f"cannot build C API: {e}")
    capi_dir = capi.lib_path().parent
    outdir = tmp_path_factory.mktemp("mex_hosts")
    exes = {}
    for name in GATEWAYS:
        exe = outdir / f"{name}_host"
        subprocess.run(
            ["gcc", "-O2", "-std=c11",
             str(MATLAB / "harness" / "harness_main.c"),
             str(MATLAB / f"mex_fnft_tpu_{name}.c"),
             f"-I{MATLAB / 'harness'}", f"-I{MATLAB}", f"-I{capi_dir}",
             f"-L{capi_dir}", "-lfnft_tpu", f"-Wl,-rpath,{capi_dir}",
             "-o", str(exe)], check=True, capture_output=True)
        exes[name] = exe
    return exes


def _cvec_file(path, z):
    buf = np.empty((len(z), 2))
    buf[:, 0] = np.real(z)
    buf[:, 1] = np.imag(z)
    buf.tofile(path)


def _read_out(prefix, i):
    meta = (prefix.parent / f"{prefix.name}.{i}.meta").read_text().split()
    m, n, kind = int(meta[0]), int(meta[1]), meta[2]
    raw = prefix.parent / f"{prefix.name}.{i}.bin"
    if kind == "string":
        return raw.read_text()
    v = np.fromfile(raw).reshape(-1, 2)
    z = v[:, 0] + 1j * v[:, 1]
    assert z.size == m * n
    return z if kind == "complex" else z.real


def _run(exe, tmp, spec_lines, expect_rc=0):
    spec = tmp / "call.spec"
    spec.write_text("\n".join(spec_lines) + "\nrun\n")
    prefix = tmp / "out"
    env = dict(os.environ, FNFT_TPU_PLATFORM="cpu")
    proc = subprocess.run([str(exe), str(spec), str(prefix)], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == expect_rc, proc.stderr
    return prefix, proc


def test_version(hosts, tmp_path):
    prefix, _ = _run(hosts["version"], tmp_path, ["nlhs 4"])
    maj = _read_out(prefix, 0)
    suffix = _read_out(prefix, 3)
    assert int(maj[0].real) == ft.FNFT_REFERENCE_VERSION[0]
    assert suffix.startswith("-tpu")


def test_nsev_matches_python(hosts, tmp_path):
    d, m = 512, 256
    t = np.linspace(-16, 16, d)
    q = (2.3j / np.cosh(t)).astype(np.complex128)
    _cvec_file(tmp_path / "q.bin", q)

    prefix, _ = _run(hosts["nsev"], tmp_path, [
        "nlhs 3", f"cvec {tmp_path / 'q.bin'}", "dvec 2 -16 16",
        "dvec 2 -2 2", "scalar 1", "str M", "scalar 256", "str quiet"])
    rho = _read_out(prefix, 0)
    lam = _read_out(prefix, 1)
    nc = _read_out(prefix, 2)

    ft.use_x64()
    res = ft.nsev(q, (-16, 16), m=m, xi_span=(-2, 2),
                  opts=ft.NsevOpts(discspec_type=ft.DiscspecType.BOTH))
    np.testing.assert_allclose(rho, np.asarray(res.reflection_coefficient),
                               rtol=0, atol=1e-12)
    order = np.argsort(lam.imag)
    ref_order = np.argsort(np.asarray(res.bound_states).imag)
    np.testing.assert_allclose(lam[order],
                               np.asarray(res.bound_states)[ref_order],
                               atol=1e-12)
    np.testing.assert_allclose(nc[order],
                               np.asarray(res.norming_constants)[ref_order],
                               atol=1e-12)


def test_nsev_cstype_ab_and_discr(hosts, tmp_path):
    d = 256
    t = np.linspace(-12, 12, d)
    q = (1.4j / np.cosh(t)).astype(np.complex128)
    _cvec_file(tmp_path / "q.bin", q)

    prefix, _ = _run(hosts["nsev"], tmp_path, [
        "nlhs 1", f"cvec {tmp_path / 'q.bin'}", "dvec 2 -12 12",
        "dvec 2 -1 1", "scalar 1", "str cstype_ab", "str discr_2split2A",
        "str skip_bs", "str quiet"])
    ab = _read_out(prefix, 0)
    assert ab.size == 2 * d  # M defaults to D; AB layout doubles it

    ft.use_x64()
    res = ft.nsev(q, (-12, 12), m=d, xi_span=(-1, 1), want_bound_states=False,
                  opts=ft.NsevOpts(contspec_type=ft.ContspecType.AB,
                                   discretization=ft.Discretization.SPLIT2A))
    np.testing.assert_allclose(ab[:d], np.asarray(res.a), atol=1e-12)
    np.testing.assert_allclose(ab[d:], np.asarray(res.b), atol=1e-12)


def test_nsev_newton_guesses(hosts, tmp_path):
    d = 512
    t = np.linspace(-16, 16, d)
    q = (2.3j / np.cosh(t)).astype(np.complex128)
    _cvec_file(tmp_path / "q.bin", q)
    _cvec_file(tmp_path / "z0.bin", np.array([0.7j, 1.9j]))

    prefix, _ = _run(hosts["nsev"], tmp_path, [
        "nlhs 2", f"cvec {tmp_path / 'q.bin'}", "dvec 2 -16 16",
        "dvec 2 -2 2", "scalar 1", "str skip_cs", "str bsloc_newton",
        f"cvec {tmp_path / 'z0.bin'}", "str quiet"])
    lam = _read_out(prefix, 1)
    # atol is the 2split4b discretization error at D=512, not the solver's
    np.testing.assert_allclose(sorted(lam.imag), [0.8, 1.8], atol=5e-4)


def test_nsev_rejects_unknown_option(hosts, tmp_path):
    d = 8
    _cvec_file(tmp_path / "q.bin", np.zeros(d, complex))
    _, proc = _run(hosts["nsev"], tmp_path, [
        "nlhs 1", f"cvec {tmp_path / 'q.bin'}", "dvec 2 -1 1",
        "dvec 2 -1 1", "scalar 1", "str no_such_option"], expect_rc=1)
    assert "has invalid value" in proc.stderr


def test_inverse_xi_matches_python(hosts, tmp_path):
    d, m = 256, 300
    prefix, _ = _run(hosts["nsev_inverse_xi"], tmp_path, [
        "nlhs 2", "scalar 256", "dvec 2 -16 16", "scalar 300"])
    xi = _read_out(prefix, 0)
    grid = _read_out(prefix, 1)
    xi0, xi1 = ft.nsev_inverse_xi_grid(d, (-16, 16), m)
    np.testing.assert_allclose([xi[0], xi[1]], [xi0, xi1], rtol=1e-15)
    np.testing.assert_allclose(grid, np.linspace(xi0, xi1, m), rtol=1e-12)


def test_inverse_multisoliton_roundtrip(hosts, tmp_path):
    d = 256
    t_span = (-16.0, 16.0)
    lam = np.array([0.5j])
    nc = np.array([1.0 + 0.0j])
    _cvec_file(tmp_path / "bs.bin", lam)
    _cvec_file(tmp_path / "nc.bin", nc)

    prefix, _ = _run(hosts["nsev_inverse"], tmp_path, [
        "nlhs 1", "empty", "dvec 2 -1 1", f"cvec {tmp_path / 'bs.bin'}",
        f"cvec {tmp_path / 'nc.bin'}", "scalar 256", "dvec 2 -16 16",
        "scalar 1", "str quiet"])
    q = _read_out(prefix, 0)

    ft.use_x64()
    q_ref = np.asarray(ft.nsev_inverse(None, (-1, 1), d, t_span,
                                       bound_states=lam,
                                       normconsts_or_residues=nc))
    np.testing.assert_allclose(q, q_ref, atol=1e-12)


def test_kdvv_matches_python(hosts, tmp_path):
    d = 256
    t = np.linspace(-10, 10, d)
    u = (2.0 / np.cosh(t) ** 2).astype(np.complex128)
    _cvec_file(tmp_path / "u.bin", u)

    prefix, _ = _run(hosts["kdvv"], tmp_path, [
        "nlhs 1", f"cvec {tmp_path / 'u.bin'}", "dvec 2 -10 10",
        "dvec 2 -2 2", "str quiet"])
    rho = _read_out(prefix, 0)

    ft.use_x64()
    res = ft.kdvv(u, (-10, 10), m=d, xi_span=(-2, 2))
    np.testing.assert_allclose(rho, np.asarray(res.reflection_coefficient),
                               atol=1e-12)


def test_nsep_matches_python(hosts, tmp_path):
    d = 256
    t = np.linspace(0, 2 * np.pi, d, endpoint=False)
    q = np.exp(2j * t).astype(np.complex128)
    _cvec_file(tmp_path / "q.bin", q)

    prefix, _ = _run(hosts["nsep"], tmp_path, [
        "nlhs 2", f"cvec {tmp_path / 'q.bin'}",
        f"dvec 2 0 {2 * np.pi:.17g}", "scalar 1", "str quiet"])
    main = _read_out(prefix, 0)
    aux = _read_out(prefix, 1)

    ft.use_x64()
    res = ft.nsep(q, (0.0, 2 * np.pi))
    ref_main = np.asarray(res.main_spectrum)
    ref_aux = np.asarray(res.aux_spectrum)
    assert main.size == ref_main.size
    assert aux.size == ref_aux.size

    def _sorted(z):
        return z[np.lexsort((z.imag, z.real))]

    np.testing.assert_allclose(_sorted(main), _sorted(ref_main), atol=1e-9)
    np.testing.assert_allclose(_sorted(aux), _sorted(ref_aux), atol=1e-9)
