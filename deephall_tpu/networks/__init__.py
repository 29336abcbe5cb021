"""Wavefunction factory (reference parity: ``networks/__init__.py:22-37``).

To add a new wavefunction: implement an ``nn.Module`` whose ``__call__`` maps a single
configuration ``[nelec, 2]`` to a complex scalar ``log psi``, add a ``NetworkType``
entry, and dispatch on it here.
"""

from flax import linen as nn

from deephall_tpu.config import Network, NetworkType, System
from deephall_tpu.networks.laughlin import Laughlin
from deephall_tpu.networks.psiformer import Psiformer


def make_network(system: System, network: Network) -> nn.Module:
    Q = system.flux / 2
    if network.type == NetworkType.laughlin:
        return Laughlin(
            flux=system.flux, nspins=system.nspins, excitation_lz=system.lz_center
        )
    if network.type == NetworkType.psiformer:
        return Psiformer(
            Q=Q,
            nspins=system.nspins,
            ndets=network.psiformer.determinants,
            num_heads=network.psiformer.num_heads,
            num_layers=network.psiformer.num_layers,
            heads_dim=network.psiformer.heads_dim,
            orbital_type=network.orbital,
        )
    raise ValueError(f"Unknown network type {network.type}")
