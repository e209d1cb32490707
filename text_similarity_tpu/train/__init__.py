from .optim import make_optimizer, linear_warmup_schedule
from .prefetch import DevicePrefetcher
from .steps import (
    make_bi_encoder_train_step,
    make_classifier_train_step,
    make_packed_bi_encoder_train_step,
    make_packed_classifier_train_step,
    TrainState,
    init_train_state,
    init_sharded_train_state,
    shard_batch_for,
    classifier_forward,
    init_classifier_head,
)

__all__ = [
    "make_optimizer",
    "linear_warmup_schedule",
    "make_bi_encoder_train_step",
    "make_classifier_train_step",
    "make_packed_bi_encoder_train_step",
    "make_packed_classifier_train_step",
    "TrainState",
    "init_train_state",
    "init_sharded_train_state",
    "shard_batch_for",
    "classifier_forward",
    "init_classifier_head",
    "DevicePrefetcher",
]
