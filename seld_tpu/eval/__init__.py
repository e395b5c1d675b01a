from seld_tpu.eval.metrics import (  # noqa: F401
    accuracy_metrics,
    seld_metrics,
)
from seld_tpu.eval.evaluate import evaluate_model  # noqa: F401
