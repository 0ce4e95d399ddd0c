from .checkpoint import load_params, save_params
from .compile_cache import enable_compilation_cache
from .logging import MetricsLogger
from .profiling import StepTimer, debug_nans, trace
