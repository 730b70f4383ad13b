from tvc.experiments.four_scenarios import (  # noqa: F401
    FourScenariosConfig,
    FourScenariosExperiment,
)
