from fnft_tpu.parallel.sharding import (  # noqa: F401
    as_auto_mesh,
    batched_nsev_contspec,
    make_mesh,
    make_nsev_batch_fn,
)
from fnft_tpu.parallel.batch_full import (  # noqa: F401
    BatchedNsevResult,
    make_batched_full_nsev,
)
from fnft_tpu.parallel.batch_nsep import (  # noqa: F401
    BatchedNsepResult,
    batched_nsep,
    make_batched_nsep_fn,
)
from fnft_tpu.parallel.dshard import (  # noqa: F401
    make_dshard_contspec,
    make_dshard_kdvv_contspec,
    make_gridsharded_chirpz,
)
from fnft_tpu.parallel.dshard_boundstates import (  # noqa: F401
    dshard_boundstates_reference,
    make_dshard_boundstates,
)
from fnft_tpu.parallel.dshard_inverse import (  # noqa: F401
    dshard_finvscatter,
    make_sharded_polymatmul,
    sharded_fft_reference,
)
from fnft_tpu.parallel.dshard_nsep import (  # noqa: F401
    dshard_nsep_reference,
    make_dshard_nsep_refine,
)
