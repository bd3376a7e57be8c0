from hippie_tpu.evaluate import embeddings, knn_eval, metrics, confmat, kfolds  # noqa: F401
