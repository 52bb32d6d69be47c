"""Python side of the C API (consumed by capi/fnft_tpu_capi.c).

Every entry point takes plain scalars and ``bytes`` buffers (complex128,
native order) and returns a tuple of (rc, ...bytes..., errmsg) — no numpy
objects cross the embedding boundary, so the C side only needs
``PyBytes_*`` and number conversions from the stable CPython ABI.

Return codes mirror the reference's fnft_errwarn classes
(include/private/fnft__errwarn.h:36-114): 0 = success, 1 = invalid
argument, 2 = internal error (subroutine failure / exception).
"""

from __future__ import annotations

import json
import os

import numpy as np

_CONFIGURED = False


def _configure():
    """One-time per-process setup: honor FNFT_TPU_PLATFORM before any
    device is touched, and switch to the reference's double precision
    (the C API is double-complex by contract)."""
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    plat = os.environ.get("FNFT_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import fnft_tpu

    fnft_tpu.use_x64()
    _CONFIGURED = True


def _c128(buf: bytes, n: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.complex128, count=n).copy()


def _bytes(arr) -> bytes:
    return np.ascontiguousarray(np.asarray(arr), dtype=np.complex128).tobytes()


def _enum(cls, val):
    """Enum from a JSON value: by value ('2split4b') or name ('SPLIT4B')."""
    if isinstance(val, cls):
        return val
    try:
        return cls(str(val).lower())
    except ValueError:
        return cls[str(val).upper()]


def _json_dict(opts_json):
    kw = json.loads(opts_json) if opts_json else {}
    if not isinstance(kw, dict):
        raise ValueError("opts_json must encode a JSON object")
    return kw


def _pop_quiet(kw):
    """Honor the MEX gateways' 'quiet' flag: silence warnings process-wide
    (mirrors the reference's fnft_errwarn_setprintf(NULL) redirect)."""
    if kw.pop("quiet", False):
        from fnft_tpu.errors import set_warn_handler

        set_warn_handler(lambda *_: None)


def _pop_cvec(kw, key):
    """Optional complex vector encoded as [[re, im], ...] in the JSON."""
    val = kw.pop(key, None)
    if val is None:
        return None
    return np.asarray([complex(re, im) for re, im in val], np.complex128)


def _opts_from_json(cls, enum_fields: dict, opts_json):
    kw = opts_json if isinstance(opts_json, dict) else _json_dict(opts_json)
    for key, ecls in enum_fields.items():
        if key in kw:
            kw[key] = _enum(ecls, kw[key])
    for key in ("bounding_box", "floquet_range"):
        if key in kw:
            kw[key] = tuple(kw[key])
    return cls(**kw)


def _fail(e):
    from fnft_tpu.errors import InvalidArgumentError

    rc = 1 if isinstance(e, (InvalidArgumentError, ValueError, KeyError,
                             TypeError)) else 2
    return rc, f"{type(e).__name__}: {e}"


def nsev(q_bytes, d, t0, t1, m, xi0, xi1, kcap, kappa, opts_json):
    """fnft_nsev (src/fnft_nsev.c:133-453 semantics).

    Returns (rc, contspec_bytes, k_found, bound_state_bytes,
    normconst_bytes, errmsg); contspec holds M/2M/3M entries following
    the reference layout for cstype REFLECTION/AB/BOTH."""
    try:
        _configure()
        import fnft_tpu as ft
        from fnft_tpu.models.nsev import (BoundStateFilter,
                                          BoundStateLocalization,
                                          ContspecType, DiscspecType,
                                          NsevOpts, nsev_with_initial_states)

        kw = _json_dict(opts_json)
        _pop_quiet(kw)
        # MEX-surface extras carried inside the JSON (matlab/ gateways):
        # 'bsloc_newton' guesses and the skip_bs flag have no slot in the
        # reference-shaped C signature, so they ride along here.
        initial_states = _pop_cvec(kw, "initial_states")
        want_bs = bool(kw.pop("want_bound_states", True))
        opts = _opts_from_json(NsevOpts, dict(
            bound_state_filtering=BoundStateFilter,
            bound_state_localization=BoundStateLocalization,
            discspec_type=DiscspecType,
            contspec_type=ContspecType,
            discretization=ft.Discretization), kw)
        q = _c128(q_bytes, d)
        xi_span = (xi0, xi1) if m > 0 else None
        if initial_states is not None:
            res = nsev_with_initial_states(
                q, (t0, t1), initial_states, m=m, xi_span=xi_span,
                kappa=kappa, opts=opts)
        else:
            res = ft.nsev(q, (t0, t1), m=m, xi_span=xi_span,
                          kappa=kappa, opts=opts,
                          want_bound_states=want_bs and kcap > 0)

        parts = []
        if m > 0:
            if opts.contspec_type in (ContspecType.REFLECTION_COEFFICIENT,
                                      ContspecType.BOTH):
                parts.append(np.asarray(res.reflection_coefficient))
            if opts.contspec_type in (ContspecType.AB, ContspecType.BOTH):
                parts.append(np.asarray(res.a))
                parts.append(np.asarray(res.b))
        cs = _bytes(np.concatenate(parts)) if parts else b""

        k = 0
        bs = nc = b""
        if kappa == +1 and kcap > 0 and res.bound_states is not None:
            lam = np.asarray(res.bound_states)[:kcap]
            k = lam.size
            bs = _bytes(lam)
            dparts = []
            if opts.discspec_type in (DiscspecType.NORMING_CONSTANTS,
                                      DiscspecType.BOTH):
                dparts.append(np.asarray(res.norming_constants)[:kcap])
            if opts.discspec_type in (DiscspecType.RESIDUES,
                                      DiscspecType.BOTH):
                dparts.append(np.asarray(res.residues)[:kcap])
            if dparts:
                nc = _bytes(np.concatenate(dparts))
        return 0, cs, k, bs, nc, ""
    except Exception as e:  # noqa: BLE001 - error codes cross the C ABI
        rc, msg = _fail(e)
        return rc, b"", 0, b"", b"", msg


def kdvv(u_bytes, d, t0, t1, m, xi0, xi1, kcap, opts_json):
    """fnft_kdvv (src/fnft_kdvv.c:59-122): contspec on the xi grid, plus
    the bound-state extension when kcap > 0."""
    try:
        _configure()
        import fnft_tpu as ft
        from fnft_tpu.models.kdvv import KdvvOpts, kdvv_bound_states

        kw = _json_dict(opts_json)
        _pop_quiet(kw)
        opts = _opts_from_json(
            KdvvOpts, dict(discretization=ft.Discretization), kw)
        u = _c128(u_bytes, d)
        res = ft.kdvv(u, (t0, t1), m=m, xi_span=(xi0, xi1), opts=opts)
        cs = _bytes(res.reflection_coefficient)
        k = 0
        bs = b""
        if kcap > 0:
            lam = np.asarray(kdvv_bound_states(u, (t0, t1)))[:kcap]
            k = lam.size
            bs = _bytes(lam)
        return 0, cs, k, bs, ""
    except Exception as e:  # noqa: BLE001
        rc, msg = _fail(e)
        return rc, b"", 0, b"", msg


def nsep(q_bytes, d, t0, t1, phase_shift, kcap, mcap, kappa, opts_json):
    """fnft_nsep (src/fnft_nsep.c:82-218): main/aux spectra."""
    try:
        _configure()
        import fnft_tpu as ft
        from fnft_tpu.models.nsep import Localization, NsepOpts, PointFilter

        kw = _json_dict(opts_json)
        _pop_quiet(kw)
        opts = _opts_from_json(NsepOpts, dict(
            localization=Localization, filtering=PointFilter,
            discretization=ft.Discretization), kw)
        q = _c128(q_bytes, d)
        res = ft.nsep(q, (t0, t1), kappa=kappa, phase_shift=phase_shift,
                      opts=opts)
        main = np.asarray(res.main_spectrum)[:kcap] \
            if res.main_spectrum is not None else np.zeros(0, complex)
        aux = np.asarray(res.aux_spectrum)[:mcap] \
            if res.aux_spectrum is not None else np.zeros(0, complex)
        return 0, main.size, _bytes(main), aux.size, _bytes(aux), ""
    except Exception as e:  # noqa: BLE001
        rc, msg = _fail(e)
        return rc, 0, b"", 0, b"", msg


def nsev_inverse(cs_bytes, m, xi0, xi1, bs_bytes, nc_bytes, k, d, t0, t1,
                 kappa, opts_json):
    """fnft_nsev_inverse (src/fnft_nsev_inverse.c:121-245)."""
    try:
        _configure()
        import fnft_tpu as ft
        from fnft_tpu.models.nsev_inverse import (InverseContspecType,
                                                  InverseCstMethod,
                                                  InverseDiscspecType,
                                                  NsevInverseOpts)

        kw = _json_dict(opts_json)
        _pop_quiet(kw)
        opts = _opts_from_json(NsevInverseOpts, dict(
            contspec_type=InverseContspecType,
            contspec_method=InverseCstMethod,
            discspec_type=InverseDiscspecType,
            discretization=ft.Discretization), kw)
        contspec = _c128(cs_bytes, m) if m > 0 and cs_bytes else None
        bound_states = _c128(bs_bytes, k) if k > 0 else None
        normconsts = _c128(nc_bytes, k) if k > 0 else None
        seed = None
        if opts.contspec_method == InverseCstMethod.USE_SEED_POTENTIAL_INSTEAD:
            # reference semantics: in seed mode the contspec slot carries
            # time-domain seed samples (fnft_nsev_inverse.c:188-200)
            seed, contspec = contspec, None
        q = ft.nsev_inverse(contspec, (xi0, xi1), d, (t0, t1), kappa=kappa,
                            bound_states=bound_states,
                            normconsts_or_residues=normconsts,
                            seed_potential=seed, opts=opts)
        return 0, _bytes(q), ""
    except Exception as e:  # noqa: BLE001
        rc, msg = _fail(e)
        return rc, b"", msg


def nsev_inverse_xi(d, t0, t1, m, opts_json):
    """fnft_nsev_inverse_XI (src/fnft_nsev_inverse.c:40-65): the canonical
    spectral grid endpoints for an M-point inverse transform."""
    try:
        _configure()
        import fnft_tpu as ft

        kw = _json_dict(opts_json)
        _pop_quiet(kw)
        disc = _enum(ft.Discretization,
                     kw.pop("discretization", ft.Discretization.SPLIT2A))
        if kw:
            raise ValueError(f"unknown options: {sorted(kw)}")
        xi0, xi1 = ft.nsev_inverse_xi_grid(d, (t0, t1), m, disc)
        return 0, float(xi0), float(xi1), ""
    except Exception as e:  # noqa: BLE001
        rc, msg = _fail(e)
        return rc, 0.0, 0.0, msg


def version():
    """fnft_version (src/fnft_version.c:26-45): the reference version this
    package provides capability parity with, plus our own suffix."""
    import fnft_tpu

    major, minor, patch = (int(x) for x in
                           fnft_tpu.FNFT_REFERENCE_VERSION[:3])
    return major, minor, patch, f"-tpu{fnft_tpu.__version__}"
