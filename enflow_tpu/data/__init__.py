from .system import System
from .neighbors import Neighbors, neighbor_list, coord_diffs
from .datasets import (
    Sample,
    BaseDataset,
    InMemoryDataset,
    ComposeDatasets,
    DataLoader,
    pad_samples,
    get_dataset_class,
)
from . import transforms
