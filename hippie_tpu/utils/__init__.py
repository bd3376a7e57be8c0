from hippie_tpu.utils import wandb_shim  # noqa: F401
