"""netobs CLI plugin map (reference ``netobs_bridge/cli_extend.py``)."""

expansions = {
    "estimator": {"deephall@": "deephall_tpu.netobs_bridge.observables."},
    "adaptor": {"deephall": "deephall_tpu.netobs_bridge.adaptor"},
}
