"""Train state: one pytree holding params, BN statistics, optimizer state and
step — replacing the reference's per-component .pth zoo + separate adam.pth
(trainer.py:1586-1691).  Orbax checkpoints this whole tree atomically, giving
step-granular resume the reference lacks (its granularity is the epoch)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def step_lr_schedule(base_lr: float, steps_per_epoch: int,
                     scheduler_step_size: int, gamma: float,
                     num_epochs: int) -> optax.Schedule:
    """torch StepLR(step_size, gamma) as an optax schedule: lr is multiplied
    by gamma at every scheduler_step_size epoch boundary
    (reference: trainer.py:239-240, defaults 15 epochs / x0.1)."""
    boundaries = {}
    e = scheduler_step_size
    while e < num_epochs:
        boundaries[e * steps_per_epoch] = gamma
        e += scheduler_step_size
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def create_train_state(model, rng: jax.Array, example_inputs: dict,
                       learning_rate, ) -> TrainState:
    """Initialise parameters and the Adam optimizer (torch defaults:
    betas (0.9, 0.999), eps 1e-8; reference trainer.py:238).

    init runs under jit: eager per-op dispatch of the ~200-layer graph is far
    slower than one compiled call, and the compiled init lands in the
    persistent compilation cache."""
    example = {k: v for k, v in example_inputs.items() if v is not None}
    variables = jax.jit(lambda r, kw: model.init(r, **kw))(rng, example)
    tx = optax.adam(learning_rate)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
