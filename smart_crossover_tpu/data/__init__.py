from smart_crossover_tpu.data.dimacs import read_dimacs_min
from smart_crossover_tpu.data.loaders import load_instance, save_instance
from smart_crossover_tpu.data.lp_format import read_lp, write_lp
from smart_crossover_tpu.data.mps import read_mps
from smart_crossover_tpu.data.ot_gen import (
    images_to_ot,
    mnist_like_ot_suite,
    random_ot_batch,
    synthetic_digits,
)
from smart_crossover_tpu.data.results import ResultStore

__all__ = [
    "read_mps",
    "read_lp",
    "write_lp",
    "read_dimacs_min",
    "load_instance",
    "save_instance",
    "images_to_ot",
    "mnist_like_ot_suite",
    "synthetic_digits",
    "random_ot_batch",
    "ResultStore",
]
