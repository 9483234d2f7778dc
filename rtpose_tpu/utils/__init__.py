from .platform import apply_platform_env
from .timer import Timer
from .progressbar import ProgressBar
from .flops import count_parameters, estimate_flops
from .freeze import freeze_mask, split_frozen
from .fileio import load as load_file, dump as dump_file
