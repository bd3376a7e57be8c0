from hippie_tpu.train import checkpoint, optim, step, loop, pipeline, orbax_io, schedule_free  # noqa: F401
