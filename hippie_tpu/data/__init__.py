from hippie_tpu.data import registry, device_data, sampling  # noqa: F401
