from hippie_tpu.train import checkpoint, optim, step, loop, pipeline  # noqa: F401
