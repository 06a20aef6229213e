"""Offline preprocessing: the reference's preprocess/ pipeline rebuilt as
importable functions + CLIs (frame extraction, feature extraction,
annotation parsing, sensor normalization, segmentation features, TFRecord
generation lives in data/tfrecords.py)."""

from multimodal_similarity_tpu.preprocess.sensors import normalize_sensors
from multimodal_similarity_tpu.preprocess.segmentation import (
    downsample_seg,
    spatial_pyramid_features,
)

__all__ = [
    "normalize_sensors",
    "spatial_pyramid_features",
    "downsample_seg",
]
