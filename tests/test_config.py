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


def test_yaml_interpolation():
    """OmegaConf-style ${path} references resolve against the merged tree.

    Reference configs may use value interpolation (OmegaConf merge at
    /root/reference/deephall/train.py:202-205); the plain-dict pipeline must
    honour it rather than pass literal '${...}' strings through.
    """
    from deephall_tpu.config import resolve_interpolations

    base = to_dict(Config())
    override = yaml.safe_load(
        """
        system:
          flux: 15
        log:
          save_path: runs/flux_${system.flux}
          restore_path: ${log.save_path}
        """
    )
    cfg = Config.from_dict(resolve_interpolations(merge_dicts(base, override)))
    assert cfg.log.save_path == "runs/flux_15"
    assert cfg.log.restore_path == "runs/flux_15"  # chained, non-string target ok


def test_yaml_interpolation_whole_value_keeps_type():
    from deephall_tpu.config import resolve_interpolations

    d = {"a": 3360, "b": "${a}", "c": {"d": "${ a }"}}
    out = resolve_interpolations(d)
    assert out["b"] == 3360 and isinstance(out["b"], int)
    assert out["c"]["d"] == 3360


def test_yaml_interpolation_errors():
    import pytest

    from deephall_tpu.config import resolve_interpolations

    with pytest.raises(ValueError, match="key not found"):
        resolve_interpolations({"a": "${missing.key}"})
    with pytest.raises(ValueError, match="resolver"):
        resolve_interpolations({"a": "${oc.env:HOME}"})
    with pytest.raises(ValueError, match="cycle"):
        resolve_interpolations({"a": "${b}", "b": "${a}"})
