from morphik_core_tpu.embedding.base_embedding_model import BaseEmbeddingModel  # noqa: F401
from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel  # noqa: F401
from morphik_core_tpu.embedding.text_embedding import (  # noqa: F401
    HashingEmbeddingModel,
    OpenAICompatEmbeddingModel,
)
