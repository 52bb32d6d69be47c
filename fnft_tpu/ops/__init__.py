from fnft_tpu.ops.poly import (  # noqa: F401
    fmult,
    fmult2x2,
    fmult2x2_tree,
    chirpz,
    poly_eval,
    poly_evalderiv,
)
from fnft_tpu.ops.roots import (poly_roots, aberth_roots,  # noqa: F401
                                aberth_roots_deflated)
from fnft_tpu.ops.gridsearch import roots_fftgridsearch, roots_fftgridsearch_paraherm  # noqa: F401
from fnft_tpu.ops.specfact import poly_specfact  # noqa: F401
from fnft_tpu.ops.df64 import fft_df64, fmult2x2_tree_df64  # noqa: F401
from fnft_tpu.ops.df64_pipeline import nsev_contspec_df64  # noqa: F401
