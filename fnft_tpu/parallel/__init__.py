from fnft_tpu.parallel.sharding import (  # noqa: F401
    batched_nsev_contspec,
    make_mesh,
)
