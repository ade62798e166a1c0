from rtmodt_tpu.parallel.mesh import create_mesh, shard_batch, replicate  # noqa: F401
