from seld_tpu.train.completion import (  # noqa: F401
    IncompleteTrainingError,
    incomplete_reason,
    run_training_stage,
    training_completed,
    workdir_incomplete_reason,
)
from seld_tpu.train.optimizer import make_optimizer, set_learning_rate, current_learning_rate  # noqa: F401
from seld_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau  # noqa: F401
from seld_tpu.train.state import TrainState, create_train_state  # noqa: F401
from seld_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
from seld_tpu.train.trainer import train_model  # noqa: F401
