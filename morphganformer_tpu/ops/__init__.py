from morphganformer_tpu.ops.bias_act import activation_funcs, bias_act  # noqa: F401
from morphganformer_tpu.ops.upfirdn2d import (  # noqa: F401
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
    filter2d,
    nearest_neighbors_kernel,
)
from morphganformer_tpu.ops.conv2d_resample import conv2d_resample  # noqa: F401
from morphganformer_tpu.ops.modulated_conv import modulated_conv2d  # noqa: F401
