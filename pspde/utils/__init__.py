from .checkpoint import load_params, save_params
from .logging import MetricsLogger
from .profiling import StepTimer, debug_nans, trace
