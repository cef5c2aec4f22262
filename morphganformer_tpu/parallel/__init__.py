from morphganformer_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_data_mesh,
    replicated,
)
