from smart_crossover_tpu.models.formats import (
    GeneralLP,
    MinCostFlow,
    OptTransport,
    StandardLP,
)
from smart_crossover_tpu.models.output import Basis, Output

__all__ = [
    "GeneralLP",
    "StandardLP",
    "MinCostFlow",
    "OptTransport",
    "Basis",
    "Output",
]
