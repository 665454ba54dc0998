"""Train state: params, frozen/batch stats, optimizer state, EMA."""

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, variables, tx, use_ema=False):
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        )

    def apply_gradients(self, grads, tx, new_batch_stats=None,
                        ema_decay=None):
        updates, new_opt_state = tx.update(grads, self.opt_state,
                                           self.params)
        new_params = optax.apply_updates(self.params, updates)

        new_ema = self.ema_params
        if new_ema is not None and ema_decay is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema, new_params)

        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    def eval_variables(self, use_ema=True):
        """Variables dict for evaluation (EMA-preferred, like the
        reference's swapping saver)."""
        params = (self.ema_params
                  if use_ema and self.ema_params is not None
                  else self.params)
        return {'params': params, 'batch_stats': self.batch_stats}

    def train_variables(self):
        return {'params': self.params, 'batch_stats': self.batch_stats}
