"""Training layer: config, state, jitted steps, schedulers, checkpoint, loop."""

from transformer_clip_eeg_tpu.train.config import TrainConfig
from transformer_clip_eeg_tpu.train.schedulers import make_scheduler
from transformer_clip_eeg_tpu.train.state import (
    TrainState,
    count_params,
    init_train_state,
    make_optimizer,
    set_learning_rate,
)
from transformer_clip_eeg_tpu.train.steps import (
    make_embed_fns,
    make_encode_fn,
    make_eval_step,
    make_train_step,
)
from transformer_clip_eeg_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_params_only,
    save_checkpoint,
    save_params_only,
)
from transformer_clip_eeg_tpu.train.loop import (
    Trainer,
    batch_iterator,
    prefetch_to_device,
    printf,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "Trainer",
    "batch_iterator",
    "count_params",
    "init_train_state",
    "make_embed_fns",
    "make_encode_fn",
    "make_eval_step",
    "make_optimizer",
    "make_scheduler",
    "make_train_step",
    "prefetch_to_device",
    "printf",
    "restore_checkpoint",
    "restore_params_only",
    "save_checkpoint",
    "save_params_only",
    "set_learning_rate",
]
