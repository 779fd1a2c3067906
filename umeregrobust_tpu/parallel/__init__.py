from umeregrobust_tpu.parallel.mesh import P, make_mesh, replicate, shard_batch
from umeregrobust_tpu.parallel.points_sharded import ume_from_ball_query_sp
