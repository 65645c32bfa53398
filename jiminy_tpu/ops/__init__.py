from jiminy_tpu.ops import lie  # noqa: F401
