from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.sinkhorn import sinkhorn, sinkhorn_plan

__all__ = ["SolverSettings", "sinkhorn", "sinkhorn_plan"]
