"""Model zoo: temporal encoders + pairwise similarity heads.

``build_encoder`` mirrors the reference trainers' --network flag dispatch
(base_model.py:115-126): tsn | rtsn | convtsn | convrtsn | convbirtsn |
convlstm, plus seq2seq/sae autoencoders.
"""

from __future__ import annotations

from multimodal_similarity_tpu.models.encoders import (
    SAE,
    TSN,
    RTSN,
    ConvBiRTSN,
    ConvLSTM,
    ConvRTSN,
    ConvTSN,
    ConvTSNClassifier,
    CUBLayer,
    OutputLayer,
    Seq2seqTSN,
)
from multimodal_similarity_tpu.models.heads import (
    PDDM,
    PairSim,
    PairSim2,
    score_all_pairs,
    score_all_pairs_sym,
    score_rows,
)
from multimodal_similarity_tpu.models.inception_resnet_v2 import (
    InceptionResNetV2,
)
from multimodal_similarity_tpu.models.inception_v1 import InceptionV1
from multimodal_similarity_tpu.models.inception_v2 import (
    InceptionV2,
    graft_slim_npz,
    graft_slim_variables,
)
from multimodal_similarity_tpu.models.lstm import LSTM, BiLSTM, TFLSTMCell


def build_encoder(network: str, *, num_seg: int = 3, emb_dim: int = 128,
                  n_input: int = 1536, n_h: int = 8, n_w: int = 8,
                  n_C: int = 20, max_time: int = 90,
                  keep_prob: float = 1.0):
    """Encoder factory keyed by the reference's --network flag values."""
    if network == "tsn":
        return TSN(n_seg=num_seg, emb_dim=emb_dim, n_input=n_input,
                   keep_prob=keep_prob)
    if network == "rtsn":
        return RTSN(n_seg=num_seg, emb_dim=emb_dim, n_input=n_input,
                    keep_prob=keep_prob)
    if network == "convtsn":
        return ConvTSN(n_seg=num_seg, emb_dim=emb_dim, n_input=n_input,
                       n_h=n_h, n_w=n_w, n_C=n_C)
    if network == "convrtsn":
        return ConvRTSN(n_seg=num_seg, emb_dim=emb_dim, n_input=n_input,
                        n_h=n_h, n_w=n_w, n_C=n_C, keep_prob=keep_prob)
    if network == "convbirtsn":
        return ConvBiRTSN(n_seg=num_seg, emb_dim=emb_dim, n_input=n_input,
                          n_h=n_h, n_w=n_w, n_C=n_C, keep_prob=keep_prob)
    if network == "convlstm":
        return ConvLSTM(max_time=max_time, emb_dim=emb_dim, n_input=n_input,
                        n_h=n_h, n_w=n_w, n_C=n_C)
    raise NotImplementedError(f"unknown network: {network}")


__all__ = [
    "TSN", "RTSN", "ConvTSN", "ConvRTSN", "ConvBiRTSN", "ConvLSTM",
    "ConvTSNClassifier", "Seq2seqTSN", "SAE", "OutputLayer", "CUBLayer",
    "PairSim", "PairSim2", "PDDM", "score_all_pairs",
    "score_all_pairs_sym", "score_rows",
    "InceptionV2", "InceptionV1", "InceptionResNetV2",
    "graft_slim_variables", "graft_slim_npz",
    "LSTM", "BiLSTM", "TFLSTMCell", "build_encoder",
]
