from morphganformer_tpu.losses.pixel import (  # noqa: F401
    dssim_loss,
    l1_loss,
    mse_loss,
    psnr,
    psnr_loss,
    ssim,
)
from morphganformer_tpu.losses.stack import (  # noqa: F401
    build_loss_stack,
    parse_loss_spec,
)
from morphganformer_tpu.losses.wing import (  # noqa: F401
    adaptive_wing_loss,
    make_adaptive_wing_loss_term,
    make_wing_loss_term,
    wing_loss,
)
