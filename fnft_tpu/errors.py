"""Error model.

The reference uses errno-style integer codes with goto-cleanup
(fnft__errwarn.h:36-114). In a JAX-native library the natural split is:

* static / shape / argument errors -> raise Python exceptions on the host
  (before tracing),
* data-dependent numerical failures inside jitted code -> NaN propagation,
  surfaced by the drivers.

Warnings go through the ``warnings`` module (the analogue of the reference's
pluggable printf, fnft_errwarn.c:42-60).
"""

from __future__ import annotations

import warnings


class FnftError(Exception):
    """Base class for fnft-tpu errors."""


class InvalidArgumentError(FnftError, ValueError):
    """Mirrors FNFT_EC_INVALID_ARGUMENT."""


class NotYetImplementedError(FnftError, NotImplementedError):
    """Mirrors FNFT_EC_NOT_YET_IMPLEMENTED."""


def check_arg(cond: bool, message: str) -> None:
    if not cond:
        raise InvalidArgumentError(message)


_warn_handler = None


def set_warn_handler(handler) -> None:
    """Install a custom warning sink, or None to restore the default.

    Mirrors the reference's pluggable printf (fnft_errwarn_setprintf,
    src/fnft_errwarn.c:52-60).
    """
    global _warn_handler
    _warn_handler = handler


def get_warn_handler():
    return _warn_handler


def warn(message: str) -> None:
    """Soft condition reporting (reference: FNFT__WARN)."""
    if _warn_handler is not None:
        _warn_handler(message)
        return
    warnings.warn(message, RuntimeWarning, stacklevel=2)
