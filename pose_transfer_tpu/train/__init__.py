from . import checkpoint, losses  # noqa: F401
from .engine import (  # noqa: F401
    GANConfig,
    GANState,
    build_models,
    create_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
