from fnft_tpu.utils import misc  # noqa: F401
