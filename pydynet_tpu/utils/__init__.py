from .profiler import trace, StepTimer
from .checkpoint import (save_checkpoint, load_checkpoint, state_dict,
                         load_state_dict, read_extra)
from .sharded_checkpoint import (save_sharded, load_sharded,
                                 save_sharded_tree, load_sharded_tree)
from .debug import debug_nans, check_finite
