from hippie_tpu.nn import functional, init  # noqa: F401
