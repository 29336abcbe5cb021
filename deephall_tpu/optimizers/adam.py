"""Adam optimizer step (reference ``/root/reference/deephall/optimizers/adam.py``).

optax Adam on the real energy gradient with the shared decay schedule.  The step is a
pure function; jitting/sharding is applied once in the driver.
"""

from __future__ import annotations

import optax

from deephall_tpu.config import OptimizerAdam
from deephall_tpu.types import CheckpointState, PRNGKey, TrainingInit, TrainingStep


def make_adam_training_step(
    optim_cfg: OptimizerAdam, loss_grad_fn
) -> tuple[TrainingInit, TrainingStep]:
    tx = optax.adam(learning_rate=optim_cfg.lr.schedule)

    def init(params, key, data):
        del key, data
        return tx.init(params)

    def step(state: CheckpointState, key: PRNGKey, penalties: dict | None = None):
        del key
        params, data, opt_state, mcmc_width = state
        stats, grads = (
            loss_grad_fn(params, data, penalties)
            if penalties
            else loss_grad_fn(params, data)
        )
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return CheckpointState(params, data, opt_state, mcmc_width), stats

    return init, step
