from hippie_tpu.models import backbones, cvae  # noqa: F401
