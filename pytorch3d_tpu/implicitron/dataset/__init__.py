"""Implicitron dataset layer: FrameData, providers, loaders (reference implicitron/dataset)."""
from .data_loader_map_provider import SceneBatchSampler, SequenceDataLoaderMapProvider
from .data_source import ImplicitronDataSource
from .dataset_base import DatasetBase, DatasetMap, ListDataset
from .frame_data import FrameData
from .json_index_dataset import JsonIndexDataset
from .rendered_mesh_dataset_map_provider import RenderedMeshDatasetMapProvider
from .sql_dataset import SqlIndexDataset, write_sql_dataset

__all__ = [k for k in dir() if not k.startswith("_")]
