from morphganformer_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_data_mesh,
    replicated,
)
from morphganformer_tpu.parallel.launch import (  # noqa: F401
    initialize_distributed,
    is_main_process,
)
