from .geometry import (
    KEY_ORDER,
    KEY_INDEX,
    GEOM_DIM,
    CLASS_KEYS,
    CLASS_NAMES,
    CLASS_LINE,
    CLASS_CIRCLE,
    CLASS_ARC,
    NULL_LABEL,
    class_mask,
    angle_plain,
    encode_conditions,
    conditions_from_csv_rows,
    conditions_from_dicts,
    infer_drawing_size,
    normalize_angle,
    snap_size,
)
from .datasets import CaptionDataset, LabelDataset, load_image
from .loader import PrefetchLoader
from .synthetic import generate_all_classes, generate_dataset, render_entity, sample_entity_params

__all__ = [
    "KEY_ORDER", "KEY_INDEX", "GEOM_DIM", "CLASS_KEYS", "CLASS_NAMES",
    "CLASS_LINE", "CLASS_CIRCLE", "CLASS_ARC", "NULL_LABEL",
    "angle_plain", "class_mask", "encode_conditions", "conditions_from_csv_rows",
    "conditions_from_dicts", "infer_drawing_size", "normalize_angle",
    "snap_size", "CaptionDataset", "LabelDataset", "load_image",
    "PrefetchLoader", "generate_all_classes", "generate_dataset",
    "render_entity", "sample_entity_params",
]
