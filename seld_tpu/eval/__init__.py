from seld_tpu.eval.metrics import (  # noqa: F401
    accuracy_metrics,
    dcase2022_metrics,
    grid_to_frame_doas,
    seld_metrics,
)
from seld_tpu.eval.evaluate import evaluate_model  # noqa: F401
