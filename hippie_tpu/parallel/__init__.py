from hippie_tpu.parallel import mesh  # noqa: F401
