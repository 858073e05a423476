from dvae_tpu.train.steps import (
    AdversarialState,
    TrainState,
    make_adversarial_step,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "AdversarialState",
    "make_train_step",
    "make_eval_step",
    "make_adversarial_step",
]
