from morphik_core_tpu.ops.maxsim import (  # noqa: F401
    maxsim_scores,
    maxsim_scores_ref,
    maxsim_topk,
    pad_multivectors,
)
from morphik_core_tpu.ops.fde import FDEConfig, fde_document, fde_query, fde_document_batch  # noqa: F401
from morphik_core_tpu.ops.binary import (  # noqa: F401
    binary_quantize,
    binary_quantize_packed,
    hamming_distance_packed,
    binary_maxsim_scores,
)
