from umeregrobust_tpu.ops.neighbors import ball_query, gather_padded, knn, pairwise_sqdist
from umeregrobust_tpu.ops.hashing import HashTable, build_hash_table, lookup
from umeregrobust_tpu.ops.gridnn import GridIndex, build_grid, nn_query
from umeregrobust_tpu.ops.densegrid import (
    DenseGrid,
    build_dense_grid,
    dense_nn_query,
    max_cell_count,
)
from umeregrobust_tpu.ops.voxel import (
    coords_to_grid_pts,
    coords_to_grid_pts_np,
    quantize_jax,
    quantize_np,
)
from umeregrobust_tpu.ops.sparse import (
    Level,
    build_conv_map,
    build_self_map,
    build_transpose_map,
    downsample_coords,
    kernel_offsets,
    make_level,
    masked_batch_norm,
    sparse_conv,
)
