from .logging import Log, RunArtifacts, dump_recommendations, run_dir
from .profiling import cost_analysis, flops_estimate

__all__ = [
    "Log", "RunArtifacts", "dump_recommendations", "run_dir",
    "cost_analysis", "flops_estimate",
]
