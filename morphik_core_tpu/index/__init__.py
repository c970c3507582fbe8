from morphik_core_tpu.index.multivector_index import MultiVectorIndex, IndexRecord  # noqa: F401
