from umeregrobust_tpu.parallel.mesh import P, make_mesh, replicate, shard_batch
