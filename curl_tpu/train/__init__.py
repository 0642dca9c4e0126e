"""Training / evaluation drivers (L4 of the framework)."""

from curl_tpu.train import checkpoint  # noqa: F401
from curl_tpu.train.loop import Evaluator, Trainer, build_model  # noqa: F401
from curl_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    onecycle_schedule,
    param_count,
)
from curl_tpu.train.steps import (  # noqa: F401
    make_eval_step,
    make_train_step,
    stack_eval_totals,
    summarize_eval,
)
