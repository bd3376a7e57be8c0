from hippie_tpu.train import checkpoint, device_fit, ensemble, optim, step, loop, pipeline, orbax_io, schedule_free  # noqa: F401
