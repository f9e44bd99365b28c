from .activations import ACT2FN, quick_gelu, gelu_tanh
from .attention import mha
