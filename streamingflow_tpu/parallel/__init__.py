from .collect import (combine_metrics, gather_across_processes,
                      psum_metric_states, sum_across_processes)
from .mesh import make_data_parallel_step, make_mesh, shard_batch
