from .steps import TrainState, make_train_step, make_eval_step, create_train_state
from .log_buffer import LogBuffer
from .checkpoint import save_checkpoint, load_checkpoint, resolve_checkpoint
from .hooks import (Hook, PRIORITIES, SamplerSeedHook, LoggerHook,
                    CheckpointHook, ProfilerHook, HTTPLoggerHook)
from .trainer import Trainer, get_root_logger
from .evaluator import run_eval, save_predictions
