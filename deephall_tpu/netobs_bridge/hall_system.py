"""FQHE system type for netobs (reference ``netobs_bridge/hall_system.py``)."""

from netobs.systems.elec_gas import ElectronGas


class HallSystem(ElectronGas):
    flux: int
