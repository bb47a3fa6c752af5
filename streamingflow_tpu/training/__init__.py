from . import losses, metrics, trainer
from .checkpoint import CheckpointManager
