from morphganformer_tpu.projection.engine import (  # noqa: F401
    ProjectionConfig,
    ProjectionResult,
    cosine_ramp_lr,
    latent_stats,
    project,
)
