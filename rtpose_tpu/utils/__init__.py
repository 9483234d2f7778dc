from .timer import Timer
from .progressbar import ProgressBar
from .flops import count_parameters, estimate_flops
from .freeze import freeze_mask, split_frozen
