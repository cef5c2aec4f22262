from morphganformer_tpu.data.dataset import (  # noqa: F401
    ImageFolderDataset,
    infinite_batches,
)
