from rtmodt_tpu.runtime.pipeline import Pipeline  # noqa: F401
