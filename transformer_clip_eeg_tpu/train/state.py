"""Train state and optimizer construction.

The train state is one pytree holding params, the memory bank, batch-norm
running stats, and optimizer state — everything that evolves across steps
(the reference's mutable state is the torch module + optimizer;
ref ``train_clip_final.py:399-412``, memory-bank buffer ``clip_model.py:711-745``).
Being a pytree it is donate-able in the jitted step, orbax-checkpointable,
and shardable with one sharding rule.

The optimizer mirrors the reference dispatch (adam/adamw, amsgrad option,
betas, weight decay; ref ``train_clip_final.py:400-412``).  The learning rate
is injected as an optax hyperparameter so the host-side scheduler can change
it every epoch without retracing the compiled step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_optimizer(
    optimizer: str,
    learning_rate: float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.01,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """Ref train_clip_final.py:400-412 (Adam / AdamW, amsgrad flag)."""

    def build(learning_rate):
        scale = (
            optax.scale_by_amsgrad(b1=beta1, b2=beta2)
            if amsgrad
            else optax.scale_by_adam(b1=beta1, b2=beta2)
        )
        chain = [scale]
        if optimizer == "adamw":
            chain.append(optax.add_decayed_weights(weight_decay))
        elif optimizer != "adam":
            raise ValueError(f"unknown optimizer {optimizer!r}")
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    # flatten: the model has ~230 small param leaves; per-leaf update ops
    # cost more than the update math (measured 3.2 → 2.4 ms/step on TPU)
    return optax.flatten(optax.inject_hyperparams(build)(learning_rate=learning_rate))


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place in the opt-state pytree."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, opt_state.hyperparams["learning_rate"].dtype
    )
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class TrainState(struct.PyTreeNode):
    """Everything that evolves across steps, as one donate-able pytree."""

    step: jax.Array
    params: Any
    membank: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.membank:
            v["membank"] = self.membank
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, grads, new_membank=None, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            membank=self.membank if new_membank is None else new_membank,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, *, apply_fn, variables, tx) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            membank=variables.get("membank", {}),
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def init_train_state(
    model,
    rng: jax.Array,
    example_batch,
    tx: optax.GradientTransformation,
) -> TrainState:
    """Initialize model variables from an example batch and wrap in a state."""
    eeg, speech, ids = example_batch
    params_rng, sample_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "sample": sample_rng},
        eeg,
        speech,
        ids,
        deterministic=True,
    )
    return TrainState.create(apply_fn=model.apply, variables=variables, tx=tx)


def count_params(tree) -> int:
    """Ref train_clip_final.py:427-441 (``get_n_params``)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
