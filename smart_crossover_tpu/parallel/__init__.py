from smart_crossover_tpu.parallel.batched_lp import batched_lp_crossover
from smart_crossover_tpu.parallel.batched import (
    batched_tnet,
    batched_tnet_exact,
    batched_tnet_exact_device,
    sharded_batched_tnet,
    sharded_batched_tnet_exact_device,
    tnet_single,
)
from smart_crossover_tpu.parallel.mesh import (
    BATCH_AXIS,
    MODEL_AXIS,
    make_mesh,
)
from smart_crossover_tpu.parallel.pdhg_sharded import sharded_pdhg
from smart_crossover_tpu.parallel.ranking_sharded import (
    sharded_mcf_flow_indicators,
    sharded_sorted_flows,
)
from smart_crossover_tpu.parallel.scenarios import mcf_scenario_sweep
from smart_crossover_tpu.parallel.tnet_sharded import sharded_tnet_single
from smart_crossover_tpu.parallel.projector import (
    sharded_projector,
    sharded_sinkhorn_plan,
)

__all__ = [
    "make_mesh",
    "BATCH_AXIS",
    "MODEL_AXIS",
    "batched_tnet",
    "batched_tnet_exact",
    "batched_lp_crossover",
    "batched_tnet_exact_device",
    "sharded_batched_tnet",
    "sharded_batched_tnet_exact_device",
    "tnet_single",
    "sharded_projector",
    "sharded_pdhg",
    "sharded_mcf_flow_indicators",
    "sharded_sorted_flows",
    "sharded_tnet_single",
    "mcf_scenario_sweep",
    "sharded_sinkhorn_plan",
]
