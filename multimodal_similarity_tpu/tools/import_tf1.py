"""Import a trained TF1 reference checkpoint into a flax params file.

    python -m multimodal_similarity_tpu tools.import_tf1 \
        --ckpt /path/to/reference_model.ckpt --model convrtsn \
        --output /path/to/params.msgpack

The output is a ``{"params": ...}`` pytree (train/checkpoints.save_pytree)
that the eval CLIs restore directly (``eval/evaluate_model.py:41-46``) and
that ``train.multimodal_model --sensors_path/--segment_path`` grafts as a
pretrained branch.  Model dimensions are inferred from the checkpoint's
own variable shapes; only the spatial grid (``--n_h/--n_w``) and sequence
lengths — which leave no trace in the parameter shapes — are flags.

``--print_vars`` lists the checkpoint's variables (name, shape) without
converting, for diagnosing an unexpected layout.
"""

from __future__ import annotations

import argparse
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.models import encoders, heads
from multimodal_similarity_tpu.train.checkpoints import save_pytree
from multimodal_similarity_tpu.utils.tf1_import import (
    _conv_filter, _find, convert_tf1_variables, read_tf1_checkpoint)


def _build(model: str, variables, n_seg: int, n_h: int, n_w: int,
           max_time: int) -> Tuple[object, tuple, dict]:
    """Construct the flax module for ``model`` with dims inferred from the
    checkpoint variables; returns (module, init_args, init_kwargs)."""
    key = model.lower()
    if key in ("tsn", "rtsn"):
        w = _find(variables, "W_1")
        n_input, emb = w.shape
        cls = encoders.TSN if key == "tsn" else encoders.RTSN
        mod = cls(n_seg=n_seg, emb_dim=int(emb), n_input=int(n_input))
        return mod, (jnp.zeros((1, n_seg, int(n_input))),), {}
    if key in ("convtsn", "convtsnclassifier", "convrtsn", "convbirtsn",
               "convlstm"):
        n_input, n_c = _conv_filter(_find(variables, "W_emb")).shape
        n_input, n_c = int(n_input), int(n_c)
        if key in ("convtsn", "convtsnclassifier"):
            hwc, emb = _find(variables, "W").shape
            if hwc != n_h * n_w * n_c:
                raise ValueError(
                    f"checkpoint fc input dim {hwc} != n_h*n_w*n_C = "
                    f"{n_h}*{n_w}*{n_c}; pass the run's --n_h/--n_w")
            kw = dict(n_seg=n_seg, n_C=n_c, emb_dim=int(emb),
                      n_input=n_input, n_h=n_h, n_w=n_w)
            if key == "convtsnclassifier":
                kw["n_output"] = int(_find(variables, "W_o").shape[1])
                mod = encoders.ConvTSNClassifier(**kw)
            else:
                mod = encoders.ConvTSN(**kw)
            return mod, (jnp.zeros((1, n_seg, n_h, n_w, n_input)),), {}
        lstm_kernel = _find(variables, "fw/lstm_cell/kernel"
                            if key == "convbirtsn" else "lstm_cell/kernel")
        units = int(lstm_kernel.shape[1]) // 4
        emb = 2 * units if key == "convbirtsn" else units
        if key == "convlstm":
            mod = encoders.ConvLSTM(max_time=max_time, n_C=n_c,
                                    emb_dim=emb, n_input=n_input,
                                    n_h=n_h, n_w=n_w)
            return mod, (jnp.zeros((1, max_time, n_h, n_w, n_input)),
                         jnp.ones((1,), jnp.int32)), {}
        cls = (encoders.ConvBiRTSN if key == "convbirtsn"
               else encoders.ConvRTSN)
        mod = cls(n_seg=n_seg, n_C=n_c, emb_dim=emb, n_input=n_input,
                  n_h=n_h, n_w=n_w)
        return mod, (jnp.zeros((1, n_seg, n_h, n_w, n_input)),), {}
    if key == "sae":
        n_input, emb = _find(variables, "W_1").shape
        mod = encoders.SAE(n_input=int(n_input), emb_dim=int(emb))
        return mod, (jnp.zeros((1, int(n_input))),), {}
    if key == "seq2seqtsn":
        n_input, emb = _find(variables, "W_encode").shape
        mod = encoders.Seq2seqTSN(n_seg=n_seg, n_input=int(n_input),
                                  emb_dim=int(emb))
        return mod, (jnp.zeros((1, n_seg, int(n_input))),), {}
    if key in ("pairsim", "pairsim2", "pddm"):
        w = _find(variables, "W_u" if key == "pddm" else "W_pairwise")
        n_input = int(w.shape[1])  # output dim == n_input in every variant
        cls = {"pairsim": heads.PairSim, "pairsim2": heads.PairSim2,
               "pddm": heads.PDDM}[key]
        mod = cls(n_input=n_input)
        z = jnp.zeros((1, n_input))
        return mod, (z, z), {"method": "score"}
    if key in ("outputlayer", "cublayer"):
        n_in, n_out = _find(variables, "W").shape
        cls = (encoders.OutputLayer if key == "outputlayer"
               else encoders.CUBLayer)
        mod = cls(n_output=int(n_out))
        return mod, (jnp.zeros((1, int(n_in))),), {}
    raise ValueError(f"unknown model {model!r}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="tools.import_tf1", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--ckpt", required=True,
                   help="TF1 .ckpt prefix (or .npz with TF1 variable names)")
    p.add_argument("--model", required=True,
                   help="flax model to import into: tsn rtsn convtsn "
                        "convrtsn convbirtsn convlstm convtsnclassifier "
                        "sae seq2seqtsn pairsim pairsim2 pddm "
                        "outputlayer cublayer")
    p.add_argument("--output", default="",
                   help="output params file (required unless --print_vars)")
    p.add_argument("--n_seg", type=int, default=3)
    p.add_argument("--n_h", type=int, default=8)
    p.add_argument("--n_w", type=int, default=8)
    p.add_argument("--max_time", type=int, default=90,
                   help="ConvLSTM max_time (no trace in param shapes)")
    p.add_argument("--scope", default="",
                   help="variable-name prefix to select and strip before "
                        "mapping (mirrors eval's --variable_name).  The "
                        "reference flagship saves BOTH branches in one "
                        "checkpoint (multimodal_model.py:178-217: "
                        "modality_sensors/RTSN/..., modality_segment/"
                        "RTSN/...), which makes every suffix ambiguous; "
                        "--scope modality_sensors picks one branch")
    p.add_argument("--print_vars", action="store_true",
                   help="list checkpoint variables and exit")
    cfg = p.parse_args(argv)

    variables = read_tf1_checkpoint(cfg.ckpt)
    if cfg.scope:
        prefix = cfg.scope.rstrip("/") + "/"
        scoped = {name[len(prefix):]: val for name, val in variables.items()
                  if name.startswith(prefix)}
        if not scoped:
            p.error(f"--scope {cfg.scope!r} matches no variable; "
                    f"prefixes present: "
                    f"{sorted({n.split('/')[0] for n in variables})}")
        variables = scoped
    if cfg.print_vars:
        for name in sorted(variables):
            print(f"{name}  {tuple(variables[name].shape)}")
        return
    if not cfg.output:
        p.error("--output is required unless --print_vars")

    mod, args, kwargs = _build(cfg.model, variables, cfg.n_seg,
                               cfg.n_h, cfg.n_w, cfg.max_time)
    template = mod.init(jax.random.PRNGKey(0), *args, **kwargs)["params"]
    params = convert_tf1_variables(cfg.model, variables, template)
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(params))
    save_pytree(cfg.output, {"params": params})
    print(f"imported {cfg.model} ({n:,} params) from {cfg.ckpt} "
          f"-> {cfg.output}")


if __name__ == "__main__":
    main()
