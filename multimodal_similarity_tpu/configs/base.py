"""Experiment configuration.

Dataclass mirrors of the reference's 3-class argparse hierarchy
(configs/base_config.py:7-85, configs/train_config.py:8-103,
configs/eval_config.py:8-57): same flag names, same defaults, same derived
fields (feature_root/label_root/..., feat_dict/feat_dim, session-list
resolution), so the reference's 19 bash experiment scripts translate 1:1.
Instances are plain dataclasses — construct programmatically for tests, or
via ``TrainConfig.parse(argv)`` for CLI use.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union


def load_session_list(path: str) -> List[str]:
    with open(path, "r") as fin:
        text = fin.read().strip()
    # an empty file means no sessions — ''.split('\n') would yield ['']
    # and send a bogus empty session id into the data loaders
    return text.split("\n") if text else []


def _resolve_sessions(value: Union[str, List[str]], data_root: str,
                      default_file: str) -> List[str]:
    """'all' -> DATA_ROOT/<default_file>; '*.txt' -> that file; else CSV."""
    if isinstance(value, list):
        return value
    if value == "all":
        path = os.path.join(data_root, default_file)
        return load_session_list(path) if os.path.exists(path) else []
    if value.endswith(".txt"):
        return load_session_list(os.path.join(data_root, value))
    return value.split(",")


@dataclass
class BaseConfig:
    name: str = "debug"
    silent_mode: bool = False
    seed: int = 12345
    ROOT: str = "./"
    DATA_ROOT: str = "./data/"

    all_session: Union[str, List[str]] = "all"
    train_session: Union[str, List[str]] = "all"
    val_session: Union[str, List[str]] = "all"
    test_session: Union[str, List[str]] = "all"

    # derived in resolve()
    feature_root: str = ""
    label_root: str = ""
    result_root: str = ""
    tfrecords_root: str = ""
    MAX_LENGTH_FRAMES: int = 90
    feat_dict: Dict[str, int] = field(
        default_factory=lambda: {"resnet": 98304, "sensors": 8})
    context_dict: Dict[str, str] = field(
        default_factory=lambda: {"label": "int", "length": "int"})
    feat_dim: Dict[str, Tuple[int, ...]] = field(
        default_factory=lambda: {"resnet": (8, 8, 1536), "sensors": (8,),
                                 "segment": (357,)})

    def resolve(self) -> "BaseConfig":
        # derived from DATA_ROOT exactly like the reference
        # (base_config.py:35-37), but an explicitly-constructed value
        # (library users: BaseConfig(result_root=...)) is honored
        for attr, sub in (("feature_root", "features/"),
                          ("label_root", "labels/"),
                          ("result_root", "results/"),
                          ("tfrecords_root", "tfrecords2/")):
            if not getattr(self, attr):
                setattr(self, attr, os.path.join(self.DATA_ROOT, sub))
        for attr, fname in (("all_session", "all_session.txt"),
                            ("train_session", "train_session.txt"),
                            ("val_session", "val_session.txt"),
                            ("test_session", "test_session.txt")):
            setattr(self, attr, _resolve_sessions(
                getattr(self, attr), self.DATA_ROOT, fname))
        if isinstance(getattr(self, "feat", None), str) and "," in self.feat:
            self.feat = self.feat.split(",")
        if getattr(self, "int8_features", False) and \
                getattr(self, "bf16_features", False):
            raise ValueError("--int8_features and --bf16_features are "
                             "mutually exclusive")
        if getattr(self, "steps_per_dispatch", 1) > 1 and \
                not getattr(self, "device_cache", False):
            raise ValueError("--steps_per_dispatch > 1 requires "
                             "--device_cache (only the cached feed has "
                             "per-step operands small enough to stack "
                             "into one program)")
        return self

    # ---- CLI ----------------------------------------------------------

    @classmethod
    def _add_args(cls, p: argparse.ArgumentParser) -> None:
        p.add_argument("--name", type=str, default="debug")
        p.add_argument("--silent_mode", action="store_true")
        p.add_argument("--seed", type=int, default=12345)
        p.add_argument("--ROOT", type=str, default="./")
        p.add_argument("--DATA_ROOT", type=str, default="./data/")
        for flag in ("all_session", "train_session", "val_session",
                     "test_session"):
            p.add_argument(f"--{flag}", type=str, default="all")

    @classmethod
    def parse(cls, argv: Optional[Sequence[str]] = None):
        p = argparse.ArgumentParser()
        cls._add_args(p)
        args = p.parse_args(argv)
        known = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in vars(args).items() if k in known})
        return cfg.resolve()


@dataclass
class TrainConfig(BaseConfig):
    model_path: Optional[str] = None
    sensors_path: Optional[str] = None
    segment_path: Optional[str] = None
    feat: Union[str, List[str]] = "resnet"
    network: str = "tsn"
    metric: str = "squaredeuclidean"
    normalized: bool = True
    reverse: bool = False
    no_soft: bool = False
    no_joint: bool = False
    weighted: bool = False

    label_num: int = 93
    task: str = "supervised"

    num_threads: int = 2
    batch_size: int = 4
    max_epochs: int = 5
    sess_per_batch: int = 3
    event_per_batch: int = 1000
    triplet_per_batch: int = 100
    num_negative: int = 3
    num_seg: int = 3
    emb_dim: int = 256
    n_h: int = 8
    n_w: int = 8
    n_C: int = 20
    n_input: int = 1536
    triplet_select: str = "random"
    multimodal_select: str = "random"
    alpha: float = 0.2
    lambda_l2: float = 0.0
    lambda_ver: float = 0.0
    lambda_multimodal: float = 0.0
    keep_prob: float = 1.0
    negative_epochs: int = 0
    multimodal_epochs: int = 0

    learning_rate: float = 0.05
    static_epochs: int = 1000
    optimizer: str = "ADAM"
    label_type: str = "goal"
    loss: str = "triplet"
    # framework extension (no reference analog): run the flagship
    # multimodal step fully fused on device — labeled semi-hard mining,
    # both PDDM all-pairs passes, hard+structure mining, and the three
    # losses in ONE jitted program instead of the host-mining loop
    device_mining: bool = False
    # framework extension: ship event features to the device as bfloat16
    # (halves the host->device transfer and the dominant HBM read of the
    # fused step; params and loss math stay f32 — measured ~18% faster
    # per step with loss identical to 4 decimals)
    bf16_features: bool = False
    int8_features: bool = False
    # framework extension: multi-process (pod) training.  --multihost
    # bootstraps jax.distributed (explicit coordinator flags or the
    # platform environment), shards the training sessions across hosts
    # (parallel/multihost.host_local_sessions), and feeds globally-sharded
    # batches assembled from per-host loaders (make_global_batch) into the
    # data-parallel fused step over a mesh spanning every process's
    # devices.  SURVEY.md §5 "per-host sharded array feeding".
    multihost: bool = False
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1
    # framework extension: device-resident int8 epoch feature cache
    # (data/device_cache.py).  Event windows upload ONCE; from epoch 2 the
    # per-epoch TSN re-sampling (the reference re-runs it on host every
    # epoch, utils.py:386-399) is an on-device gather and the link carries
    # only the tiny index/label/mask plan.  Falls back to the streaming
    # feed (with a notice) when the estimated cache exceeds
    # --device_cache_gb of HBM.
    device_cache: bool = False
    device_cache_gb: float = 6.0
    # framework extension: tensor parallelism.  --model_parallel N builds
    # a (devices/N) x N dp x tp mesh and column-shards the encoder weight
    # matrices over the "model" axis (parallel/tensor_parallel.py); XLA
    # SPMD inserts the ICI collectives.  For wide configs (emb_dim >=
    # 1024, 1536-channel conv embeds) whose per-chip weights/activations
    # outgrow pure data parallelism.
    model_parallel: int = 0
    # framework extension: multi-step dispatch over the device cache.
    # --steps_per_dispatch K runs K optimizer steps as ONE jitted program
    # (lax.scan over the fused gather+train body): the host uploads K
    # stacked KB-scale plans and pays ONE dispatch for K steps.  On a
    # high-latency link dispatch is the measured governing per-step cost
    # (RESULTS.md), so throughput approaches K x; on a co-located host it
    # removes K-1 dispatch overheads per window.  Requires
    # --device_cache (only the cached feed has per-step operands small
    # enough to stack).  Preemption/watchdog granularity becomes the
    # window: a SIGTERM stops at the next window boundary.
    steps_per_dispatch: int = 1
    # framework extension: deferred step-metrics readback
    # (utils/logging.DeferredStepLogs).  float() on a step's loss blocks
    # until the device returns it; on a co-located host that costs
    # microseconds, but over a remote-coordinator link it serializes
    # dispatch (step N+1 cannot be enqueued until step N's scalars
    # round-trip).  The loop trainers therefore QUEUE each step's device
    # scalars and read them back every N steps — every step's values are
    # still logged exactly, just N steps later.  1 = synchronous
    # (per-step readback, the pre-round-4 behavior).
    log_flush_every: int = 32
    # framework extension: per-step hang watchdog (utils/watchdog.py).
    # --watchdog_secs N arms a deadline around every step dispatch +
    # readback; on expiry it dumps all thread tracebacks and requests a
    # preemption-style stop so the run checkpoints instead of hanging
    # silently (SURVEY.md §5 failure detection).  0 disables.
    watchdog_secs: float = 0.0
    # framework extension: capture a jax.profiler device-timeline trace
    # (TensorBoard/Perfetto-viewable) of a short window of steady-state
    # steps — the compile step is skipped so the trace shows the real
    # per-step timeline (utils/profiling.py, SURVEY §5 "TPU equivalent:
    # jax.profiler trace")
    profile_dir: str = ""
    profile_steps: int = 5

    @classmethod
    def _add_args(cls, p: argparse.ArgumentParser) -> None:
        super()._add_args(p)
        p.add_argument("--model_path", type=str, default=None)
        p.add_argument("--sensors_path", type=str, default=None)
        p.add_argument("--segment_path", type=str, default=None)
        p.add_argument("--feat", type=str, default="resnet")
        p.add_argument("--network", type=str, default="tsn")
        p.add_argument("--metric", type=str, default="squaredeuclidean")
        p.add_argument("--no_normalized", dest="normalized",
                       action="store_false")
        p.set_defaults(normalized=True)
        p.add_argument("--reverse", action="store_true")
        p.add_argument("--no_soft", action="store_true")
        p.add_argument("--no_joint", action="store_true")
        p.add_argument("--weighted", action="store_true")
        p.add_argument("--label_num", type=int, default=93)
        p.add_argument("--task", type=str, default="supervised")
        p.add_argument("--num_threads", type=int, default=2)
        p.add_argument("--batch_size", type=int, default=4)
        p.add_argument("--max_epochs", type=int, default=5)
        p.add_argument("--sess_per_batch", type=int, default=3)
        p.add_argument("--event_per_batch", type=int, default=1000)
        p.add_argument("--triplet_per_batch", type=int, default=100)
        p.add_argument("--num_negative", type=int, default=3)
        p.add_argument("--num_seg", type=int, default=3)
        p.add_argument("--emb_dim", type=int, default=256)
        p.add_argument("--n_h", type=int, default=8)
        p.add_argument("--n_w", type=int, default=8)
        p.add_argument("--n_C", type=int, default=20)
        p.add_argument("--n_input", type=int, default=1536)
        p.add_argument("--triplet_select", type=str, default="random")
        p.add_argument("--multimodal_select", type=str, default="random")
        p.add_argument(
            "--device_mining", action="store_true",
            help="flagship: fuse mining+PDDM+losses into one device "
                 "program; scales the PDDM pass O(H*N) where the default "
                 "host-mining mode materializes the [N, N] similarity "
                 "matrix (parity mode; fine at event_per_batch<=1000)")
        p.add_argument("--bf16_features", action="store_true",
                       help="ship event features as bfloat16 (half the "
                            "wire and HBM-read bytes)")
        p.add_argument("--int8_features", action="store_true",
                       help="ship event features quantized int8 (quarter "
                            "of f32 wire bytes; device-fed paths only)")
        p.add_argument("--multihost", action="store_true")
        p.add_argument("--coordinator_address", type=str, default="")
        p.add_argument("--num_processes", type=int, default=0)
        p.add_argument("--process_id", type=int, default=-1)
        p.add_argument("--device_cache", action="store_true",
                       help="upload the train set once as int8 windows; "
                            "epochs >= 2 re-sample TSN segments on device "
                            "(no per-epoch feature upload)")
        p.add_argument("--device_cache_gb", type=float, default=6.0,
                       help="HBM budget for --device_cache; estimates "
                            "above it fall back to the streaming feed")
        p.add_argument("--model_parallel", type=int, default=0,
                       help="tensor parallelism: column-shard wide weight "
                            "matrices over N chips (dp x tp mesh)")
        p.add_argument("--steps_per_dispatch", type=int, default=1,
                       help="run K optimizer steps per program dispatch "
                            "(lax.scan over the fused cached step; "
                            "requires --device_cache)")
        p.add_argument("--log_flush_every", type=int, default=32,
                       help="read step metrics back from the device every "
                            "N steps instead of every step (keeps dispatch "
                            "pipelined on high-latency links; every step "
                            "is still logged; 1 = synchronous; honored by "
                            "the device-fed loop trainers: base_model, "
                            "batch-hard/lifted, the fused flagship)")
        p.add_argument("--watchdog_secs", type=float, default=0.0,
                       help="hang watchdog: dump tracebacks and "
                            "checkpoint-and-stop when no heartbeat lands "
                            "within this many seconds (0 = off).  Sizing: "
                            "beats fire per DISPATCH, not per optimizer "
                            "step, and the deferred-metrics flush blocks "
                            "until queued steps really finished — so a "
                            "healthy run's worst beat gap is "
                            "max(first-dispatch compile, "
                            "max(steps_per_dispatch, log_flush_every) x "
                            "per-step device time, one val chunk).  Set "
                            "the deadline above that; detection latency "
                            "after a real hang is then <= this value "
                            "(docs/WORKFLOW.md 'Sizing --watchdog_secs')")
        p.add_argument("--profile_dir", type=str, default="")
        p.add_argument("--profile_steps", type=int, default=5)
        p.add_argument("--alpha", type=float, default=0.2)
        p.add_argument("--lambda_l2", type=float, default=0.0)
        p.add_argument("--lambda_ver", type=float, default=0.0)
        p.add_argument("--lambda_multimodal", type=float, default=0.0)
        p.add_argument("--keep_prob", type=float, default=1.0)
        p.add_argument("--negative_epochs", type=int, default=0)
        p.add_argument("--multimodal_epochs", type=int, default=0)
        p.add_argument("--learning_rate", type=float, default=0.05)
        p.add_argument("--static_epochs", type=int, default=1000)
        p.add_argument("--optimizer", type=str, default="ADAM")
        p.add_argument("--label_type", type=str, default="goal")
        p.add_argument("--loss", type=str, default="triplet")


@dataclass
class EvalConfig(BaseConfig):
    model_path: Optional[str] = None
    sensors_path: Optional[str] = None
    variable_name: str = ""
    feat: Union[str, List[str]] = "resnet"
    network: str = "tsn"
    preprocess_func: str = "mean"
    use_output: bool = False
    transfer: bool = True
    num_seg: int = 3
    emb_dim: int = 256
    batch_size: int = 4
    n_h: int = 8
    n_w: int = 8
    n_C: int = 20
    n_input: int = 1536
    label_type: str = "goal"
    normalized: bool = True
    reverse: bool = False

    @classmethod
    def _add_args(cls, p: argparse.ArgumentParser) -> None:
        super()._add_args(p)
        p.add_argument("--model_path", type=str, default=None)
        p.add_argument("--sensors_path", type=str, default=None)
        p.add_argument("--variable_name", type=str, default="")
        p.add_argument("--feat", type=str, default="resnet")
        p.add_argument("--network", type=str, default="tsn")
        p.add_argument("--preprocess_func", type=str, default="mean")
        p.add_argument("--use_output", action="store_true")
        p.add_argument("--no_transfer", dest="transfer", action="store_false")
        p.set_defaults(transfer=True)
        p.add_argument("--num_seg", type=int, default=3)
        p.add_argument("--emb_dim", type=int, default=256)
        p.add_argument("--batch_size", type=int, default=4)
        p.add_argument("--n_h", type=int, default=8)
        p.add_argument("--n_w", type=int, default=8)
        p.add_argument("--n_C", type=int, default=20)
        p.add_argument("--n_input", type=int, default=1536)
        p.add_argument("--label_type", type=str, default="goal")
        p.add_argument("--no_normalized", dest="normalized",
                       action="store_false")
        p.set_defaults(normalized=True)
        p.add_argument("--reverse", action="store_true")


def write_configure_to_file(cfg, result_dir: str) -> None:
    """Config snapshot to <result_dir>/config.txt (utils.py:424-427)."""
    with open(os.path.join(result_dir, "config.txt"), "w") as fout:
        for key, value in sorted(vars(cfg).items()):
            fout.write("%s: %s\n" % (key, str(value)))
