from dvae_tpu.utils.misc import count_parameters, get_key
from dvae_tpu.utils.profiling import Timer, trace_annotation

__all__ = ["count_parameters", "get_key", "Timer", "trace_annotation"]
