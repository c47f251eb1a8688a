from smart_crossover_tpu.utils.timer import Timer

__all__ = ["Timer"]
