from morphik_core_tpu.models.colqwen.config import (  # noqa: F401
    ColQwenConfig,
    TextConfig,
    VisionConfig,
)
from morphik_core_tpu.models.colqwen.model import ColQwenModel  # noqa: F401
