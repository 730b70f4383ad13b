from tvc.core.pallas.consistency_kernel import (  # noqa: F401
    consistency_scores_reference,
    fused_consistency_scores,
)
