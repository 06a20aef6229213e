"""Config system: dataclass mirrors of the reference argparse hierarchy."""

from multimodal_similarity_tpu.configs.base import (
    BaseConfig,
    EvalConfig,
    TrainConfig,
    load_session_list,
    write_configure_to_file,
)

__all__ = [
    "BaseConfig",
    "TrainConfig",
    "EvalConfig",
    "load_session_list",
    "write_configure_to_file",
]
