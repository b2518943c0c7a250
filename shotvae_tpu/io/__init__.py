"""IO: orbax checkpointing, tensorboard logging."""

from shotvae_tpu.io.checkpoint import CheckpointManager
from shotvae_tpu.io.tb import TBWriter, make_image_grid

__all__ = ["CheckpointManager", "TBWriter", "make_image_grid"]
