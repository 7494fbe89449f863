from .checkpoint import save_checkpoint, load_checkpoint
from .logging import ScalarLogger

__all__ = ["save_checkpoint", "load_checkpoint", "ScalarLogger"]
