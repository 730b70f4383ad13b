from tvc.defenses.consistency_checker import ConsistencyChecker  # noqa: F401
from tvc.defenses.detector import DetectionConfig, MultiModalDefenseDetector  # noqa: F401
