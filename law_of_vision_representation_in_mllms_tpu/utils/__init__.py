from .logging import MetricsLogger, rank0_print
from .profiling import phase_timer, trace_profile
