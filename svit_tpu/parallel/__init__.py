from svit_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    data_sharding,
    param_sharding,
    replicated,
)
