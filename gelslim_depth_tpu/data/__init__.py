from gelslim_depth_tpu.data.pt_io import load_pt, save_pt
from gelslim_depth_tpu.data.dataset import BakedDataset, bake_dataset, BatchIterator
from gelslim_depth_tpu.data.general_dataset import GeneralDataset

__all__ = ["load_pt", "save_pt", "BakedDataset", "bake_dataset", "BatchIterator", "GeneralDataset"]
