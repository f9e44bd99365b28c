from .precision import Precision, DEFAULT_PRECISION, FP32_PRECISION
