from morphganformer_tpu.checkpoint.io import (  # noqa: F401
    load_discriminator,
    load_generator,
    load_network,
    save_discriminator,
    save_generator,
)
