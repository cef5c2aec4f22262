from morphganformer_tpu.utils.image import (  # noqa: F401
    adjust_range,
    create_img_grid,
    crop_max_rectangle,
    from_pil,
    load_target,
    to_pil,
)
