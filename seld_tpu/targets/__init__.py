from seld_tpu.targets.rasterize import (  # noqa: F401
    decode_class_bitmask,
    encode_events_to_bitmask,
    bitmask_to_dense,
    rasterize_point_labels,
    total_label_frames,
)
from seld_tpu.targets.gaussian import (  # noqa: F401
    draw_source_noise,
    gaussian_region_mask,
    rasterize_gaussian_labels,
)
