"""Train-state pytree.

``{params, bn_state, opt_state, step}`` — the JAX analogue of the
reference's ``{model, optimizer, scheduler}`` checkpoint dict
(``/root/reference/train.py:191-193``; the LR schedule is a pure function of
``step``, so no scheduler state is stored).
"""

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, params, bn_state, tx):
        return cls(params=params, bn_state=bn_state,
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))
