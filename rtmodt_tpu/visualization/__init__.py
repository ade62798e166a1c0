from rtmodt_tpu.visualization.renderer import FrameRenderer  # noqa: F401
