from rtmodt_tpu.config.loader import (  # noqa: F401
    PipelineConfig,
    load_config,
    load_yaml,
    default_config_path,
)
