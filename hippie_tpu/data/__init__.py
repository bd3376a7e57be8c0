from hippie_tpu.data import registry, device_data, sampling, fastcsv, synth  # noqa: F401
