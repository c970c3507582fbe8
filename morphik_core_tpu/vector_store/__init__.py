from morphik_core_tpu.vector_store.base_vector_store import BaseVectorStore  # noqa: F401
from morphik_core_tpu.vector_store.tpu_multivector_store import TPUMultiVectorStore  # noqa: F401
from morphik_core_tpu.vector_store.text_vector_store import TextVectorStore  # noqa: F401
