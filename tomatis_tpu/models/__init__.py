from tomatis_tpu.models import standard  # noqa: F401
