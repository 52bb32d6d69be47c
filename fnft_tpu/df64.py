"""Public surface of the double-float (reference-accuracy-on-TPU) mode.

Convenience namespace re-exporting the float32-pair pipelines:

>>> from fnft_tpu import df64
>>> rho = df64.nsev_contspec(q, d=4096, m=4096, t_span=..., xi_span=...)
>>> lam = df64.nsev_boundstates(q, d=4096, t_span=...)
>>> rho_kdv = df64.kdvv_contspec(u, d=4096, m=16, t_span=..., xi_span=...)
>>> q = df64.finvscatter(transfer_matrix, eps_t, kappa)
>>> q = df64.nsev_inverse(rho, xi_span, d, t_span, kappa=-1)

See docs/performance.md ("Precision") for measured accuracy and cost.
"""

from fnft_tpu.ops.df64 import poly_specfact_df64 as poly_specfact  # noqa: F401
from fnft_tpu.ops.df64_inverse import (  # noqa: F401
    finvscatter_df64 as finvscatter,
    nsev_inverse_b_of_tau_df64 as nsev_inverse_b_of_tau,
    nsev_inverse_b_of_xi_df64 as nsev_inverse_b_of_xi,
    nsev_inverse_df64 as nsev_inverse,
)
from fnft_tpu.ops.df64_pipeline import (  # noqa: F401
    enable_compilation_cache,
    kdvv_contspec_df64 as kdvv_contspec,
    nsev_boundstates_df64 as nsev_boundstates,
    nsev_boundstates_df64_batched as nsev_boundstates_batched,
    nsev_contspec_df64 as nsev_contspec,
)
