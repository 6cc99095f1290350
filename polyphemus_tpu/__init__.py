"""polyphemus_tpu — TPU-native framework for graph-based polyphonic
multitrack music generation (the capabilities of EmanueleCosenza/polyphemus,
redesigned for JAX/XLA/Pallas on TPU)."""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .config import (GenerationConfig, ModelConfig, TrainConfig,  # noqa: F401
                     load_train_config)
