"""Forward NFT for the (quasi-)periodic NSE: main and auxiliary spectra.

TPU rebuild of fnft_nsep.c (implemented in the nsep milestone; see
SURVEY.md section 3.4 for the call stack being reproduced).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np

from fnft_tpu.errors import NotYetImplementedError
from fnft_tpu.models.discretization import Discretization


class Localization(enum.Enum):          # fnft_nsep.h:54-58
    SUBSAMPLE_AND_REFINE = "subsample_and_refine"
    GRIDSEARCH = "gridsearch"
    MIXED = "mixed"


class PointFilter(enum.Enum):           # fnft_nsep.h:70-74
    NONE = "none"
    MANUAL = "manual"
    AUTO = "auto"


@dataclasses.dataclass(frozen=True)
class NsepOpts:
    """Defaults mirror fnft_nsep_default_opts (fnft_nsep.c:27-41)."""

    localization: Localization = Localization.MIXED
    filtering: PointFilter = PointFilter.AUTO
    bounding_box: tuple = (-np.inf, np.inf, -np.inf, np.inf)
    max_evals: int = 20
    discretization: Discretization = Discretization.SPLIT2A
    normalization_flag: bool = True
    floquet_range: tuple = (-1.0, 1.0)
    points_per_spine: int = 2
    dsub: int = 0
    tol: float = -1.0  # auto


@dataclasses.dataclass
class NsepResult:
    main_spectrum: Optional[np.ndarray] = None
    aux_spectrum: Optional[np.ndarray] = None


def nsep(q, t_span, *, kappa: int = +1, phase_shift: float = 0.0,
         opts: NsepOpts | None = None) -> NsepResult:
    raise NotYetImplementedError(
        "nsep lands in the periodic-NFT milestone (SURVEY.md section 7, step 6)")
