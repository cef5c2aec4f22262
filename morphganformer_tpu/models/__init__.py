from morphganformer_tpu.models.config import (  # noqa: F401
    AttentionConfig,
    DiscriminatorConfig,
    GANformerConfig,
    MappingConfig,
    ffhq256_config,
    ffhq1024_config,
)
from morphganformer_tpu.models.generator import Generator, init_generator  # noqa: F401
from morphganformer_tpu.models.discriminator import Discriminator  # noqa: F401
from morphganformer_tpu.models.mapping import MappingNetwork  # noqa: F401
from morphganformer_tpu.models.synthesis import SynthesisNetwork  # noqa: F401
from morphganformer_tpu.models.transformer import TransformerLayer  # noqa: F401
