from smart_crossover_tpu.lp_methods.algorithms import run_perturb_algorithm
from smart_crossover_tpu.lp_methods.lp_manager import LPManager

__all__ = ["run_perturb_algorithm", "LPManager"]
