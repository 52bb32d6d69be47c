from fnft_tpu.parallel.sharding import (  # noqa: F401
    batched_nsev_contspec,
    make_mesh,
    make_nsev_batch_fn,
)
from fnft_tpu.parallel.batch_full import (  # noqa: F401
    BatchedNsevResult,
    make_batched_full_nsev,
)
