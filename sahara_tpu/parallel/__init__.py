from sahara_tpu.parallel.mesh import data_mesh, replicate_index, shard_queries
from sahara_tpu.parallel.search import distributed_scheme_search
