from adlm_tpu.data.constants import CLASS_TABLES, ClassTable, get_class_table
from adlm_tpu.data.dataset import SegmentationDataset
from adlm_tpu.data.pipeline import BatchLoader, superbatch_iterator

__all__ = [
    "CLASS_TABLES",
    "ClassTable",
    "get_class_table",
    "SegmentationDataset",
    "BatchLoader",
    "superbatch_iterator",
]
