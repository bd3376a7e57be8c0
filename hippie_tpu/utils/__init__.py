from hippie_tpu.utils import wandb_shim, logging, profiling, cache  # noqa: F401
