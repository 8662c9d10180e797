from vietasr_tpu.train.optim import novograd, make_optimizer
from vietasr_tpu.train.schedules import (
    make_schedule,
    warmup_cosine,
    warmup_hold_cosine,
    inverse_square_root,
    polynomial_decay,
)
from vietasr_tpu.train.state import TrainState
from vietasr_tpu.train.loop import make_train_step, make_eval_step, Trainer
from vietasr_tpu.train.metrics import word_error_rate, levenshtein
from vietasr_tpu.train.checkpoint import CheckpointManager

__all__ = [
    "novograd",
    "make_optimizer",
    "make_schedule",
    "warmup_cosine",
    "warmup_hold_cosine",
    "inverse_square_root",
    "polynomial_decay",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "Trainer",
    "word_error_rate",
    "levenshtein",
    "CheckpointManager",
]
from vietasr_tpu.train.freeze import (freeze, unfreeze_schedule,
                                      make_value_schedule)
