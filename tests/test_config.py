"""Config system tests: dotlist parsing, YAML round-trip, merge precedence."""

import yaml

from deephall_tpu.config import (
    Config,
    InteractionType,
    NetworkType,
    OptimizerName,
    dotlist_to_dict,
    merge_dicts,
    to_dict,
    to_yaml,
)


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.batch_size == 3360
    assert cfg.system.flux == 2
    assert cfg.system.nspins == (3, 0)
    assert cfg.optim.optimizer == OptimizerName.kfac
    assert cfg.optim.kfac.lr.rate == 0.05
    assert cfg.optim.adam.lr.rate == 0.005
    assert cfg.mcmc.steps == 10 and cfg.mcmc.width == 0.1 and cfg.mcmc.burn_in == 200
    assert cfg.log.save_time_interval == 600
    assert cfg.log.save_step_interval == 1000


def test_dotlist_roundtrip():
    base = to_dict(Config())
    override = dotlist_to_dict(
        ["system.nspins=[4, 0]", "system.flux=9", "optim.optimizer=none",
         "network.type=laughlin", "system.interaction_type=harmonic"]
    )
    cfg = Config.from_dict(merge_dicts(base, override))
    assert cfg.system.nspins == (4, 0)
    assert cfg.system.flux == 9
    assert cfg.optim.optimizer == OptimizerName.none
    assert cfg.network.type == NetworkType.laughlin
    assert cfg.system.interaction_type == InteractionType.harmonic


def test_yaml_roundtrip():
    cfg = Config()
    cfg.seed = 1
    text = to_yaml(cfg)
    restored = Config.from_dict(yaml.safe_load(text))
    assert restored == cfg
    assert "iterations: 1000" in text


def test_extra_keys_tolerated():
    d = to_dict(Config())
    d["unknown_key"] = 42
    d["system"]["bogus"] = "x"
    cfg = Config.from_dict(d)
    assert cfg.system.flux == 2


def test_lr_schedule():
    cfg = Config()
    sched = cfg.optim.kfac.lr
    assert sched.schedule(0) == 0.05
    assert sched.schedule(2000) == 0.025
