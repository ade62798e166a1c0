from rtmodt_tpu.ingestion.rtsp_reader import RTSPReader  # noqa: F401
