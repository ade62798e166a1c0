from rtmodt_tpu.serving.server import create_app, serve  # noqa: F401
