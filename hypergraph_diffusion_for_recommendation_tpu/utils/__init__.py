from .logging import Log, RunArtifacts, dump_recommendations, run_dir

__all__ = ["Log", "RunArtifacts", "dump_recommendations", "run_dir"]
