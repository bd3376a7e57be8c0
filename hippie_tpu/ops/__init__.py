from hippie_tpu.ops import resample, preprocess, losses, knn, clustering  # noqa: F401
