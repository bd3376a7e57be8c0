from hippie_tpu.evaluate import embeddings, knn_eval, metrics, confmat  # noqa: F401
