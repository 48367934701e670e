"""Train state + Orbax checkpointing.

The reference checkpoints bare ``model.state_dict()`` per epoch and never
saves optimizer state (SURVEY §5) — resume restarts optimisation.  Here the
FULL train state (params, BN stats, Adam moments, step, epoch) is saved via
Orbax, giving true preemption-safe resume; a converter for reference .pth
files lives in muscle_tpu.convert.
"""

from __future__ import annotations

import os
from typing import Any

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_adam(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 weight decay folded into the gradient
    *before* the moment updates (unlike AdamW), matching
    train_mcl.py:134 / train_muscle.py:148."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=lr)


def create_train_state(variables: dict, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=0,
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Mutate the injected learning-rate hyperparameter (plateau schedule)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    return state.replace(opt_state=opt_state)


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> None:
    """Write (a) the full train state via Orbax for resume and (b) a
    msgpack of {params, batch_stats} for inference loading (the reference's
    per-epoch .pth analogue, train_mcl.py:283)."""
    import flax.serialization
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()

    host = jax.device_get(state.variables())
    with open(os.path.join(ckpt_dir, f"model_{step}.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(host))


def restore_checkpoint(ckpt_dir: str, step: int, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def load_model_msgpack(path: str, init_variables: dict) -> dict:
    """Restore a {params, batch_stats} msgpack into the structure of
    ``init_variables`` (strict shape/structure match)."""
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.from_bytes(init_variables, f.read())
