from tvc.core.pallas.consistency_kernel import (  # noqa: F401
    consistency_scores_reference,
    fused_consistency_scores,
)
from tvc.core.pallas.topk_kernel import bank_topk  # noqa: F401
