"""Data layer: on-disk contract readers, loaders, TSN prep, TFRecord IO."""

from multimodal_similarity_tpu.data.datasets import (
    load_data_and_label,
    load_validation_set,
    modality_suffix,
    prepare_dataset,
    prepare_multimodal_dataset,
)
from multimodal_similarity_tpu.data.honda import (
    HONDA_NUM2LABELS,
    LABEL_TRANSFER,
    MAX_LENGTH,
    MIN_LENGTH,
    MIN_LENGTH_BACKGROUND,
    MODALITY_SUFFIX,
    STIMULI_NUM2LABELS,
)
from multimodal_similarity_tpu.data.cub import (
    generate_synthetic_cub,
    load_cub,
    prepare_attribute,
    sample_cub_batch,
)
from multimodal_similarity_tpu.data.loader import SessionBatchLoader
from multimodal_similarity_tpu.data.device_feed import (
    device_prefetch,
    feed_shardings,
    make_batch_placer,
)
from multimodal_similarity_tpu.data.tfrecord_loader import (
    EventTFRecordLoader,
    list_event_tfrecords,
)
from multimodal_similarity_tpu.data.synthetic import generate_synthetic_honda
from multimodal_similarity_tpu.data.tsn import (
    make_prepare_input,
    max_pool_input,
    mean_pool_input,
    rnn_prepare_input,
    tsn_center_offsets,
    tsn_prepare_input,
    tsn_prepare_input_test,
    tsn_sample_offsets,
)

__all__ = [
    "prepare_dataset", "prepare_multimodal_dataset", "load_data_and_label",
    "load_validation_set", "modality_suffix", "SessionBatchLoader",
    "generate_synthetic_honda", "make_prepare_input", "tsn_prepare_input",
    "tsn_prepare_input_test", "rnn_prepare_input", "tsn_sample_offsets",
    "tsn_center_offsets", "mean_pool_input", "max_pool_input",
    "LABEL_TRANSFER", "MIN_LENGTH", "MAX_LENGTH", "MIN_LENGTH_BACKGROUND",
    "MODALITY_SUFFIX", "HONDA_NUM2LABELS", "STIMULI_NUM2LABELS",
    "load_cub", "generate_synthetic_cub", "sample_cub_batch",
    "prepare_attribute", "EventTFRecordLoader", "list_event_tfrecords",
    "device_prefetch", "feed_shardings", "make_batch_placer",
]
