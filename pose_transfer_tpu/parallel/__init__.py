from .mesh import (  # noqa: F401
    batch_shardings,
    config_for_mesh,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_state,
    unreplicate_state,
)
