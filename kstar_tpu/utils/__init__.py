from .profiling import profile_trace, set_debug_nans
from .summary import model_summary
