from .checkpoint import save_checkpoint, load_checkpoint
from .debug import (assert_all_finite, enable_numerics_debug,
                    numerics_debug_enabled)
from .logging import ScalarLogger

__all__ = ["save_checkpoint", "load_checkpoint", "ScalarLogger",
           "assert_all_finite", "enable_numerics_debug",
           "numerics_debug_enabled"]
