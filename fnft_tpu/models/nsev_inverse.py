"""Inverse NFT for the vanishing-BC NSE.

TPU rebuild of fnft_nsev_inverse.c (implemented in the inverse milestone;
see SURVEY.md section 3.3 for the call stack being reproduced).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np

from fnft_tpu.errors import NotYetImplementedError
from fnft_tpu.models.discretization import Discretization


class InverseContspecType(enum.Enum):   # fnft_nsev_inverse.h:58-62
    REFLECTION_COEFFICIENT = "reflection_coefficient"
    B_OF_XI = "b_of_xi"
    B_OF_TAU = "b_of_tau"


class InverseCstMethod(enum.Enum):      # fnft_nsev_inverse.h:108-113
    DEFAULT = "default"
    TFMATRIX_CONTAINS_REFL_COEFF = "tf_refl"
    TFMATRIX_CONTAINS_AB_FROM_ITER = "tf_ab_iter"
    USE_SEED_POTENTIAL_INSTEAD = "seed_potential"


class InverseDiscspecType(enum.Enum):
    NORMING_CONSTANTS = "norming_constants"
    RESIDUES = "residues"


@dataclasses.dataclass(frozen=True)
class NsevInverseOpts:
    """Defaults mirror fnft_nsev_inverse_default_opts (:26-33)."""

    discretization: Discretization = Discretization.SPLIT2A
    contspec_type: InverseContspecType = InverseContspecType.REFLECTION_COEFFICIENT
    contspec_method: InverseCstMethod = InverseCstMethod.DEFAULT
    discspec_type: InverseDiscspecType = InverseDiscspecType.NORMING_CONSTANTS
    max_iter: int = 100
    oversampling_factor: int = 8


def nsev_inverse_xi_grid(d: int, t_span, m: int,
                         disc: Discretization = Discretization.SPLIT2A):
    """Canonical xi grid for the inverse transform (fnft_nsev_inverse_XI,
    :40-65)."""
    from fnft_tpu.models.discretization import degree1step_total

    t0, t1 = float(t_span[0]), float(t_span[1])
    eps_t = (t1 - t0) / (d - 1)
    deg1 = degree1step_total(disc)
    xi0 = -np.pi * deg1 / (2 * eps_t)
    eps_xi = np.pi * deg1 / (eps_t * m)
    return xi0 + 0.5 * eps_xi, xi0 + (m - 0.5) * eps_xi


def nsev_inverse(contspec, xi_span, d: int, t_span, *, kappa: int = +1,
                 bound_states=None, normconsts_or_residues=None,
                 opts: NsevInverseOpts | None = None):
    raise NotYetImplementedError(
        "nsev_inverse lands in the inverse milestone (SURVEY.md section 7, step 8)")
