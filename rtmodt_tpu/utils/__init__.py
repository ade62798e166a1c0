from rtmodt_tpu.utils.logging import logger  # noqa: F401
