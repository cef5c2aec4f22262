from morphganformer_tpu.training.loss import LossConfig  # noqa: F401
from morphganformer_tpu.training.train_step import (  # noqa: F401
    GANTrainer,
    TrainConfig,
    make_data_mesh,
)
