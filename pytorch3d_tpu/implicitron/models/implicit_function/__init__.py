"""Implicit functions: NeRF, SRN, IDR, voxel grids (reference implicitron/models/implicit_function)."""
from .base import ImplicitFunctionBase
from .idr_feature_field import IdrFeatureField
from .neural_radiance_field import (
    NeRFormerImplicitFunction,
    NeuralRadianceFieldImplicitFunction,
)
from .scene_representation_networks import (
    SRNHyperNetImplicitFunction,
    SRNImplicitFunction,
)
from .decoding_functions import (
    DecoderFunctionBase,
    ElementwiseDecoder,
    MLPDecoder,
    MLPWithInputSkips,
)
from .voxel_grid import (
    CPFactorizedVoxelGrid,
    CPFactorizedVoxelGridValues,
    FullResolutionVoxelGrid,
    FullResolutionVoxelGridValues,
    VMFactorizedVoxelGrid,
    VMFactorizedVoxelGridValues,
    VoxelGridBase,
    VoxelGridValuesBase,
    VoxelGridModule,
    apply_resolution_change,
    crop_values,
    interpolate_line,
    interpolate_plane,
    interpolate_tensor,
    interpolate_volume,
)
from .voxel_grid_implicit_function import VoxelGridImplicitFunction

__all__ = [k for k in dir() if not k.startswith("_")]
