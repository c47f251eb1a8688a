from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.sinkhorn import sinkhorn, sinkhorn_plan

__all__ = [
    "SolverSettings",
    "sinkhorn",
    "sinkhorn_plan",
    # heavier engines are imported lazily below
    "ipm_solve",
    "ipm_general_lp",
    "primal_simplex",
    "dual_simplex",
    "network_simplex",
    "pdhg_solve",
    "pdhg_general_lp",
    "apply_projector",
    "presolve_lp",
    "solve_lp",
    "solve_mcf",
    "solve_ot",
    "SolverCaller",
    "generate_solver_caller",
]

_LAZY = {
    "ipm_solve": ("smart_crossover_tpu.solvers.ipm", "ipm_solve"),
    "ipm_general_lp": ("smart_crossover_tpu.solvers.ipm", "ipm_general_lp"),
    "primal_simplex": ("smart_crossover_tpu.solvers.simplex", "primal_simplex"),
    "dual_simplex": ("smart_crossover_tpu.solvers.simplex", "dual_simplex"),
    "network_simplex": ("smart_crossover_tpu.solvers.network_simplex",
                        "network_simplex"),
    "pdhg_solve": ("smart_crossover_tpu.solvers.pdhg", "pdhg_solve"),
    "pdhg_general_lp": ("smart_crossover_tpu.solvers.pdhg", "pdhg_general_lp"),
    "apply_projector": ("smart_crossover_tpu.solvers.projection",
                        "apply_projector"),
    "presolve_lp": ("smart_crossover_tpu.solvers.presolve", "presolve_lp"),
    "solve_lp": ("smart_crossover_tpu.solvers.solving", "solve_lp"),
    "solve_mcf": ("smart_crossover_tpu.solvers.solving", "solve_mcf"),
    "solve_ot": ("smart_crossover_tpu.solvers.solving", "solve_ot"),
    "SolverCaller": ("smart_crossover_tpu.solvers.caller", "SolverCaller"),
    "generate_solver_caller": ("smart_crossover_tpu.solvers.caller",
                               "generate_solver_caller"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(
        f"module 'smart_crossover_tpu.solvers' has no attribute {name!r}")
