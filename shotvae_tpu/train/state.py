"""Train state and torch-semantics optimizers.

The reference trains with ``torch.optim.SGD(lr, momentum=0.9, wd=5e-4)``
(main_shot_vae.py:198) — weight decay added to the *gradient* before the
momentum buffer, decay applied to every parameter including BN scale/bias —
and ``optim.Adam`` for the smooth-ELBO scripts
(main_smooth_ELBO_mnist.py:424). ``sgd_torch`` reproduces the former
exactly with an optax chain; LR schedules live in the chain so the whole
update is one jitted function of the step counter.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Params + BN running stats + optimizer state + step counter."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state,
        )


def sgd_torch(learning_rate, momentum: float = 0.9, weight_decay: float = 5e-4,
              nesterov: bool = False) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: g += wd*p, then momentum, then lr.

    ``learning_rate`` may be a float or an optax schedule (so the MultiStepLR
    + warmup lives inside the jitted update).
    """
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov))
    return optax.chain(*parts)


def adam_torch(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (main_smooth_ELBO_mnist.py:424)."""
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)


def init_model(model, rng, sample_input, *, train: bool = True, **kwargs):
    """Initialise a model returning (params, batch_stats)."""
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    variables = model.init(rngs, sample_input, train=train, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return params, batch_stats
