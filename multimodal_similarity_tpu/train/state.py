"""Train state and optimizer factory.

Optimizer hyperparameters are pinned to the reference's ``utils.optimize``
(utils.py:10-53): notably Adam's unusual epsilon=0.1, RMSProp with
decay=0.9/momentum=0.9/epsilon=1.0, Nesterov momentum 0.9, Adadelta
rho=0.9/eps=1e-6.  The reference's 0.1 gradient multiplier on pretrained
branch scopes (modality_sensors / modality_segment / InceptionV2,
utils.py:27-38) is expressed as a per-top-level-subtree gradient scaling.

The learning-rate schedule reproduces base_model.py:220-224: constant for
``static_epochs`` then exponential decay by 0.001**frac — driven by a
scalar per-step learning rate fed into the optimizer via inject_hyperparams.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jnp.ndarray

# branch scopes whose gradients are scaled by 0.1 (utils.py:27-38)
PRETRAINED_BRANCH_SCOPES = ("modality_sensors", "modality_segment",
                            "InceptionV2")


class TrainState(struct.PyTreeNode):
    """Pure-functional training state (params + optimizer state + step).

    ``tx`` is a STATIC (non-pytree) field: it participates in jit cache
    keys by object identity.  Build the optimizer ONCE per training run
    and reuse it — creating a fresh ``build_optimizer(...)`` per state
    silently recompiles every jitted step that takes the state.
    """

    step: Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, learning_rate: Optional[Array] = None):
        if learning_rate is not None:
            self.opt_state.hyperparams["learning_rate"] = learning_rate
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def _path_matches(path, scope: str) -> bool:
    """True if the param path starts with the '/'-joined scope prefix."""
    parts = scope.split("/")
    if len(path) < len(parts):
        return False
    return all(getattr(path[i], "key", None) == parts[i]
               for i in range(len(parts)))


def _branch_scale(scopes: Sequence[str], scale: float):
    """Gradient transformation scaling subtrees whose path starts with any
    of the '/'-joined ``scopes`` prefixes by ``scale``."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def scale_tree(path, g):
            if any(_path_matches(path, s) for s in scopes):
                return g * scale
            return g

        return (jax.tree_util.tree_map_with_path(scale_tree, updates), state)

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_scopes(scopes: Sequence[str]):
    """Zero updates for '/'-joined path prefixes — the functional analog of
    the reference's train_var_list exclusion (multimodal_model.py:285-290)."""
    return _branch_scale(tuple(scopes), 0.0)


def build_optimizer(
    optimizer: str = "ADAM",
    learning_rate: float = 0.05,
    branch_scopes: Sequence[str] = PRETRAINED_BRANCH_SCOPES,
    branch_scale: float = 0.1,
    frozen_scopes: Sequence[str] = (),
) -> optax.GradientTransformation:
    """Optimizer keyed by the reference --optimizer flag.

    The returned transformation exposes ``learning_rate`` through
    inject_hyperparams so schedules can set it per step.  ``frozen_scopes``
    ('/'-joined path prefixes) receive zero updates.
    """

    def core(learning_rate):
        if optimizer == "ADAGRAD":
            return optax.adagrad(learning_rate)
        if optimizer == "ADADELTA":
            return optax.adadelta(learning_rate, rho=0.9, eps=1e-6)
        if optimizer == "ADAM":
            return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=0.1)
        if optimizer == "RMSPROP":
            # initial_scale=1.0: tf.train.RMSPropOptimizer (utils.py:19)
            # initializes the mean-square accumulator to ones, unlike the
            # optax/PyTorch default of zeros
            return optax.rmsprop(learning_rate, decay=0.9, eps=1.0,
                                 momentum=0.9, initial_scale=1.0)
        if optimizer == "MOMENTUM":
            return optax.sgd(learning_rate, momentum=0.9, nesterov=True)
        return optax.sgd(learning_rate)

    frozen = tuple(frozen_scopes)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            _branch_scale(tuple(branch_scopes), branch_scale),
            freeze_scopes(frozen) if frozen else optax.identity(),
            core(learning_rate),
        ))(learning_rate=learning_rate)
    return tx


def learning_rate_schedule(epoch: float, learning_rate: float,
                           static_epochs: int, max_epochs: int,
                           decay_base: float = 0.001) -> float:
    """Constant then decay_base**frac exponential decay.

    base_model.py:220-224 uses 0.001; the multimodal/DCCA trainers use 0.01
    (multimodal_model.py:399-403)."""
    if epoch < static_epochs:
        return learning_rate
    frac = (epoch - static_epochs) / max(max_epochs - static_epochs, 1)
    return learning_rate * decay_base ** frac


def l2_regularization(params, filter_biases: bool = True) -> Array:
    """sum of l2_regularizer(1.0) over weight matrices: 0.5 * sum(w^2).

    The reference attaches tf.contrib l2 regularizers (scale 1.0) to every
    kernel/weight (not biases) and adds ``reg * lambda_l2`` to the loss
    (base_model.py:153-154).
    """

    def is_weight(path) -> bool:
        name = path[-1].key if path else ""
        if not filter_biases:
            return True
        # LSTM internals are exempt: the reference regularizes only its
        # hand-declared W_* matrices (networks.py get_variable calls) —
        # tf.contrib.rnn.LSTMCell variables never join
        # REGULARIZATION_LOSSES.  Our LSTM weights all live under a
        # scan-cell scope named "cell" (models/lstm.py).
        if any(str(getattr(p, "key", "")) == "cell" for p in path):
            return False
        return not str(name).startswith("b")

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = jnp.zeros((), jnp.float32)
    for path, leaf in leaves:
        if is_weight(path):
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total
