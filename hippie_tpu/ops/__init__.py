from hippie_tpu.ops import resample, preprocess, losses, clustering  # noqa: F401
