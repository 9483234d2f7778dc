from .optim import (
    one_cycle_values,
    make_one_cycle_fns,
    adam_one_cycle,
    build_optimizer_from_cfg,
)
from .schedules import piecewise_weight
