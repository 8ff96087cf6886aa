from svit_tpu.ops import pooling, rel_pos  # noqa: F401
