from tvc.evaluation.data_validator import (  # noqa: F401
    DataValidationConfig,
    DataValidator,
    ValidationResult,
)
from tvc.evaluation.experiment_evaluator import (  # noqa: F401
    ExperimentConfig,
    ExperimentEvaluator,
    ExperimentResult,
)
