"""Inference (no-op) optimizer: evaluate statistics, keep parameters fixed.

Reference ``/root/reference/deephall/optimizers/none.py``.  Uses ``ENERGY_DIFF`` mode
so no parameter gradients are computed at all (the reference evaluates and discards
them).
"""

from __future__ import annotations

from deephall_tpu.types import CheckpointState, PRNGKey, TrainingInit, TrainingStep


def make_inference_step(loss_diff_fn) -> tuple[TrainingInit, TrainingStep]:
    def init(params, key, data):
        del params, key, data
        return None

    def step(state: CheckpointState, key: PRNGKey, penalties: dict | None = None):
        del key
        params, data, opt_state, mcmc_width = state
        stats, _ = (
            loss_diff_fn(params, data, penalties)
            if penalties
            else loss_diff_fn(params, data)
        )
        return CheckpointState(params, data, opt_state, mcmc_width), stats

    return init, step
