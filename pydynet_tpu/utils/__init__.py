from .profiler import trace, StepTimer
from .checkpoint import (save_checkpoint, load_checkpoint, state_dict,
                         load_state_dict)
from .debug import debug_nans, check_finite
