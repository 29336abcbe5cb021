"""Exact-diagonalization eigenstates as first-quantized wavefunctions.

Bridges the ED oracle (``observables/ed.py``) into the framework's network
protocol: an ``EDResult`` eigenvector becomes a batched ``data -> log psi``
callable, so every wavefunction surface — the Hamiltonian's per-config local
energy, the overlap estimator, the excited-state orthogonality penalty — can
consume the *exact* LLL eigenstate.  Nothing in the reference reaches this:
its only analytic target is the Laughlin/CF family
(``/root/reference/deephall/networks/laughlin.py``), while this evaluator
represents any eigenstate of any ED block.

Construction: the ED basis states are Slater determinants of the LLL monopole
orbitals ``phi_b = C_b u^b v^{2Q-b}`` (orbital index ``b = Q + m``, the exact
convention of ``ed._radial_profiles``; ``C_b^2 = (2Q+1) binom(2Q, b) / 4pi``),
with ascending-``b`` column order matching ``ed.lz_basis``'s tuples and real
eigenvector amplitudes (the Hamiltonian is real in this basis).  So

    psi_ED(x) = sum_k c_k det[ phi_{b_kj}(x_i) ] ,

evaluated as a stable complex log-sum-exp over per-determinant ``slogdet``
values (``ops/slogdet`` — TPU-safe, custom JVPs, so the Hessian-based
``hamiltonian.local_energy`` differentiates straight through it).

Exactness makes the strongest oracles in the repo: pointwise, the kinetic
local value is exactly ``N/2`` (any LLL state is a kinetic eigenstate) and the
``L^2`` local value is the exact multiplet eigenvalue; the *mean* local energy
over ``|psi_ED|^2`` equals the ED eigenvalue ``N/2 + E_k``.  (It is not
pointwise constant: ED diagonalizes the LLL-*projected* interaction, so
``V psi`` has higher-Landau-level components and the multiplicative ``V(x)``
fluctuates walker to walker.)  See ``tests/test_edstate.py``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import numpy as jnp
from scipy.special import gammaln

from deephall_tpu.config import System
from deephall_tpu.geometry import spinors
from deephall_tpu.observables import ed
from deephall_tpu.ops.slogdet import slogdet


def make_ed_logpsi(result: ed.EDResult, two_q: int, state: int = 0):
    """First-quantized ``data [..., nelec, 2] -> complex log psi`` evaluator.

    Args:
        result: ED output whose eigenvector(s) to evaluate.  ``state > 0``
            needs ``result.states`` (dense ``ed_block`` keeps the lowest
            ``num_states`` vectors; the native Lanczos path keeps the ground
            state only).
        two_q: Monopole flux ``2Q`` of the block.
        state: Which eigenstate (0 = ground).

    Returns:
        A jit/vmap-friendly function of the electron configuration; batch
        dimensions are arbitrary (the same contract as ``model.apply``).
    """
    if state == 0:
        amplitudes = result.ground_state
    else:
        if result.states is None:
            raise ValueError("EDResult carries no excited eigenvectors")
        amplitudes = result.states[:, state]
    n_orb = two_q + 1
    basis = jnp.asarray(np.array(result.basis))  # [dim, nelec], ascending rows
    amps = jnp.asarray(amplitudes)  # [dim], real
    bs = np.arange(n_orb)
    # C_b^2 = (2Q+1) binom(2Q, b) / (4 pi), in log space (2Q up to ~30 here).
    log_c = 0.5 * (
        np.log(n_orb)
        + gammaln(two_q + 1)
        - gammaln(bs + 1.0)
        - gammaln(two_q - bs + 1.0)
        - np.log(4.0 * np.pi)
    )
    c = jnp.asarray(np.exp(log_c))

    def logpsi(data: jnp.ndarray) -> jnp.ndarray:
        u, v = spinors(data[..., 0], data[..., 1])  # [..., nelec]
        # Integer powers u^0..u^2Q via cumprod: no log(0) at the poles.
        ones = jnp.ones_like(u[..., None])
        powu = jnp.cumprod(
            jnp.concatenate([ones, jnp.repeat(u[..., None], two_q, axis=-1)], -1), -1
        )
        powv = jnp.cumprod(
            jnp.concatenate([ones, jnp.repeat(v[..., None], two_q, axis=-1)], -1), -1
        )
        orbitals = c * powu * powv[..., ::-1]  # [..., nelec, n_orb]
        # Slater matrices of every basis state: [..., dim, nelec, nelec].
        mats = jnp.moveaxis(orbitals[..., :, basis], -3, -2)
        sign, logabs = slogdet(mats)  # [..., dim]
        # Log-sum-exp shift: gradients flow through the terms, not the peak.
        peak = jax.lax.stop_gradient(jnp.max(logabs, axis=-1))
        terms = amps * sign * jnp.exp(logabs - peak[..., None])
        return peak + jnp.log(jnp.sum(terms, axis=-1))

    return logpsi


def make_ed_network(
    system: System, state: int = 0, two_lz: int = 0, max_dim: int = 2000
):
    """Run ED for ``system`` and wrap the eigenstate in the network protocol.

    Returns ``(network, result)`` where ``network(params, data)`` ignores
    ``params`` (the state has none) — the same calling convention as
    ``model.apply``, so it drops into ``hamiltonian.local_energy``, the
    overlap machinery and ``loss`` fixed-state hooks unchanged.

    Raises:
        ValueError: If the Lz block exceeds ``max_dim``.  Both halves of this
            bridge scale with the dimension: the dense ``ed_block`` holds a
            ``dim^2`` float64 Hamiltonian, and — the binding cost — each
            forward pass materializes a ``[batch, dim, nelec, nelec]``
            complex Slater tensor (at the production batch 3360 that is
            ~1 GB per 1000 basis states for N=6), so an oversized block OOMs
            or stalls the evaluator rather than merely running slowly.  The
            default bound sits a little above the largest validated blocks
            (dim <= 910); raise it deliberately only with a small batch.
    """
    nelec = sum(system.nspins)
    dim = ed.lz_block_dim(abs(system.flux) + 1, nelec, two_lz)
    if dim > max_dim:
        raise ValueError(
            f"ED block N={nelec}, 2Q={abs(system.flux)}, 2Lz={two_lz} has "
            f"{dim} states (> max_dim={max_dim}): too large to use as a "
            "first-quantized wavefunction — the evaluator sums one determinant "
            "per basis state, materializing a [batch, dim, nelec, nelec] "
            f"complex tensor (~{3360 * dim * nelec * nelec * 8 / 1e9:.1f} GB "
            "at batch 3360). Use the Laughlin/CF overlap estimator or the "
            "native Lanczos backend for energies instead, or pass a larger "
            "max_dim explicitly with a reduced batch."
        )
    result = ed.ed_block(
        nelec,
        abs(system.flux),
        interaction=str(system.interaction_type),
        two_lz=two_lz,
        radius=system.radius,
        num_states=max(6, state + 1),
    )
    logpsi = make_ed_logpsi(result, abs(system.flux), state=state)

    def network(params, data):
        del params
        return logpsi(data)

    return network, result
