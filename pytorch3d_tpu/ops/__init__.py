"""3D ops: knn, sampling, alignment, conversions, filtering (reference pytorch3d/ops)."""
from .ball_query import ball_query
from .cameras_alignment import corresponding_cameras_alignment
from .cubify import cubify
from .graph_conv import GraphConv, gather_scatter, gather_scatter_python
from .iou_box3d import box3d_overlap
from .marching_cubes import marching_cubes, marching_cubes_naive
from .perspective_n_points import efficient_pnp
from .points_to_volumes import (
    add_points_features_to_volume_densities_features,
    add_pointclouds_to_volumes,
)
from .grid_sample import grid_sample
from .interp_face_attrs import (
    interpolate_face_attributes,
    interpolate_face_attributes_python,
)
from .knn import knn_gather, knn_points
from .laplacian_matrices import cot_laplacian, laplacian, norm_laplacian
from .mesh_face_areas_normals import mesh_face_areas_normals
from .mesh_filtering import taubin_smoothing
from .packed_to_padded import packed_to_padded, padded_to_packed
from .points_alignment import (
    corresponding_points_alignment,
    iterative_closest_point,
)
from .points_normals import (
    estimate_pointcloud_local_coord_frames,
    estimate_pointcloud_normals,
)
from .sample_farthest_points import (
    sample_farthest_points,
    sample_farthest_points_naive,
)
from .sample_points_from_meshes import sample_points_from_meshes
from .subdivide_meshes import SubdivideMeshes
from .utils import (
    convert_pointclouds_to_tensor,
    eyes,
    get_point_covariances,
    is_pointclouds,
    masked_gather,
    wmean,
)
from .vert_align import vert_align

__all__ = [k for k in dir() if not k.startswith("_")]
