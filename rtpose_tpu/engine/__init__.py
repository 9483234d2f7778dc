from .steps import TrainState, make_train_step, make_eval_step, create_train_state
