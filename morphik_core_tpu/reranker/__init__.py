from morphik_core_tpu.reranker.rerankers import (  # noqa: F401
    BaseReranker,
    OverlapReranker,
    CrossEncoderReranker,
    build_reranker,
)
