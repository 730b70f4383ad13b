from tvc.analysis.run_analysis import (  # noqa: F401
    UnifiedAnalysisRunner,
    generate_charts,
    generate_comprehensive_report,
    generate_latex_tables,
)
