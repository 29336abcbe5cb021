"""Observable estimators: density, pair correlation, 1-RDM, Laughlin overlap.

Feature parity with the reference's netobs estimators
(``/root/reference/deephall/netobs_bridge/observables/``), organised differently:
the physics of each observable lives in a **per-step kernel** (a pure function of
walkers/params), and two thin drivers consume the kernels —

* the functional :class:`Estimator` (init/evaluate/digest) used by the standalone
  runner (``deephall_tpu.observables.runner``), which accumulates running means in
  a jit-friendly state so the loop shards over the global walker mesh; and
* the netobs plugin classes (``deephall_tpu.netobs_bridge.observables``), which
  return the kernels' per-walker arrays each step, matching the reference's
  netobs value contract (across-step error bars are netobs's job there).

Keeping one kernel per observable guarantees the two surfaces cannot drift apart.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, NamedTuple

import jax
import numpy as np
from jax import numpy as jnp

from deephall_tpu.config import Config
from deephall_tpu.geometry import pairwise_cos
from deephall_tpu.networks import make_network
from deephall_tpu.observables.harmonics import make_monopole_harm

logger = logging.getLogger("deephall")

# --------------------------------------------------------------------------- #
# Per-step kernels (single source of truth for the physics)
# --------------------------------------------------------------------------- #


def density_histogram(data: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Histogram of electron polar angles over [0, pi] (density profile)."""
    theta = jnp.reshape(data[..., 0], (-1,))
    hist, _ = jnp.histogram(theta, bins, range=(0.0, float(jnp.pi)))
    return hist


def pair_histogram(data: jnp.ndarray, bins: int) -> jnp.ndarray:
    """One step's normalised pair-correlation histogram g(theta_12).

    1/sin-weighted pairwise-angle histogram with the weight floored at sin =
    1e-6: exactly (anti)podal pairs are measure-zero but reachable at f32 and
    would inject infinities.  (The reference applies no floor and can produce
    inf bins; this is the framework's one deliberate deviation, applied to
    *both* analysis surfaces.)
    """
    batch_size, nelec = data.shape[0], data.shape[-2]
    iu = jnp.triu_indices(nelec, 1)
    cos12 = pairwise_cos(data)
    theta12 = jnp.arccos(jnp.clip(cos12[:, iu[0], iu[1]], -1, 1)).reshape(-1)
    weights = 1 / jnp.maximum(jnp.sin(theta12), 1e-6)
    hist, _ = jnp.histogram(theta12, bins, range=(0, float(jnp.pi)), weights=weights)
    # Factor 2 from (i != j) -> (i < j); per-step normalisation.
    return hist * 4 * bins / batch_size / nelec**2 / jnp.pi


def sample_insertion_points(key: jnp.ndarray, batch: tuple[int, ...]) -> jnp.ndarray:
    """Uniform sphere points r' used as 1-RDM insertion positions, ``[*batch, 2]``."""
    k1, k2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(k1, batch, minval=-1, maxval=1))
    phi = jax.random.uniform(k2, batch, minval=-jnp.pi, maxval=jnp.pi)
    return jnp.stack([theta, phi], axis=-1)


def make_rdm_product(cfg: Config, network) -> Callable:
    """Build the per-walker 1-RDM integrand in the LLL monopole-harmonics basis.

    For each walker R and insertion point r', computes

        4 pi * sum_a exp(log psi(R'_a) - log psi(R)) phi_i(r_a) phi_j*(r'_a)

    where R'_a replaces electron a's position with r' (the diagonal trick).

    Returns:
        ``product(params, data [B,N,2], r_prime [B,1,2]) -> [B, norb, norb]``.
    """
    Q = cfg.system.flux / 2
    orbitals = [make_monopole_harm(Q, Q, m) for m in np.arange(-Q, Q + 1)]
    nelec = sum(cfg.system.nspins)

    def eval_one(params, data, r_prime):
        data_prime = jnp.repeat(data[None], nelec, axis=0)
        data_prime = data_prime.at[jnp.diag_indices(nelec, 2)].set(r_prime[0])

        logpsi = network(params, data)
        logpsi_prime = jax.vmap(lambda d: network(params, d))(data_prime)
        varphi = jnp.stack([orb(data) for orb in orbitals], axis=-1)
        varphi_prime = jnp.stack([orb(r_prime) for orb in orbitals], axis=-1)

        wf_ratio = jnp.exp(logpsi_prime - logpsi)
        # < sum_a Psi*(R'_a)/Psi*(R) phi_i(r_a) phi_j*(r'_a) >
        return (4 * jnp.pi) * jnp.sum(
            wf_ratio[..., None, None]
            * varphi[..., None]
            * jnp.conj(varphi_prime)[..., None, :],
            axis=0,
        )

    return jax.vmap(eval_one, in_axes=(None, 0, 0))


def make_overlap_ratios(cfg: Config, network) -> Callable:
    """Build the per-walker importance ratios against the analytic Laughlin state.

    overlap = |E[r]|^2 / E[|r|^2] with r = exp(log phi - log psi - shift); the
    per-step mean shift keeps the exponentials in range and cancels in the final
    quotient (reference ``observables/overlap.py:55-70``).

    Returns:
        ``ratios(params, data [B,N,2]) -> (ratio [B] complex, ratio_square [B])``.
    """
    laughlin = make_network(
        cfg.system, dataclasses.replace(cfg.network, type="laughlin")
    )
    return make_target_ratios(network, lambda data: laughlin.apply({}, data))


def make_target_ratios(network, target_logpsi) -> Callable:
    """Per-walker importance ratios of ``network`` against any target state.

    Generalizes :func:`make_overlap_ratios` to an arbitrary batched
    ``data -> log phi`` target (the analytic Laughlin state, an ED eigenstate,
    another trained checkpoint ...).
    """

    def ratios(params, data):
        logpsi = network(params, data)
        logphi = target_logpsi(data)
        shift = jnp.mean((logphi - logpsi).real)
        ratio = jnp.exp(logphi - logpsi - shift)
        return ratio, jnp.abs(ratio) ** 2

    return ratios


# --------------------------------------------------------------------------- #
# Functional estimators for the standalone runner
# --------------------------------------------------------------------------- #


class Estimator(NamedTuple):
    """A pure-functional observable estimator.

    ``init(steps)`` builds the accumulator state; ``evaluate(params, key, data,
    state)`` returns the updated state after one walking step; ``digest(state,
    steps)`` produces the final named results (host side).
    """

    init: Callable[[int], Any]
    evaluate: Callable[..., Any]
    digest: Callable[[Any, int], dict[str, np.ndarray]]


def make_density(cfg: Config, network, bins: int = 50) -> Estimator:
    """Density-profile histogram accumulator (reference ``density.py:24-48``)."""
    del cfg, network

    def init(steps: int):
        del steps
        return {"map": jnp.zeros(bins)}

    def evaluate(params, key, data, state):
        del params, key
        return {"map": state["map"] + density_histogram(data, bins)}

    def digest(state, steps: int):
        del steps
        return {"map": np.asarray(jax.device_get(state["map"]))}

    return Estimator(init, evaluate, digest)


def make_pair_corr(cfg: Config, network, bins: int = 200) -> Estimator:
    """Pair-correlation accumulator (reference ``pair_corr.py:29-64``)."""
    del cfg, network

    def init(steps: int):
        del steps
        return {"pair_corr": jnp.zeros(bins)}

    def evaluate(params, key, data, state):
        del params, key
        return {"pair_corr": state["pair_corr"] + pair_histogram(data, bins)}

    def digest(state, steps: int):
        return {"pair_corr": np.asarray(jax.device_get(state["pair_corr"])) / steps}

    return Estimator(init, evaluate, digest)


def make_one_rdm(cfg: Config, network) -> Estimator:
    """One-body reduced density matrix accumulator (reference ``one_rdm.py:65-119``)."""
    norb = cfg.system.flux + 1
    batch_product = make_rdm_product(cfg, network)

    # State carries split real/imag planes: complex arrays cannot cross the host
    # boundary on this TPU runtime (see utils.ComplexPair).
    def init(steps: int):
        del steps
        return {
            "one_rdm_re": jnp.zeros((norb, norb)),
            "one_rdm_im": jnp.zeros((norb, norb)),
            "count": 0.0,
        }

    def evaluate(params, key, data, state):
        r_prime = sample_insertion_points(key, data.shape[:1])[:, None, :]
        product = jnp.mean(batch_product(params, data, r_prime), axis=0)
        return {
            "one_rdm_re": state["one_rdm_re"] + product.real,
            "one_rdm_im": state["one_rdm_im"] + product.imag,
            "count": state["count"] + 1.0,
        }

    def digest(state, steps: int):
        del steps
        rdm_real = np.asarray(jax.device_get(state["one_rdm_re"]))
        rdm_imag = np.asarray(jax.device_get(state["one_rdm_im"]))
        one_rdm = (rdm_real + 1j * rdm_imag) / float(jax.device_get(state["count"]))
        return {
            "one_rdm": one_rdm,
            "diagonal": np.diagonal(one_rdm),
            "trace": np.trace(one_rdm),
        }

    return Estimator(init, evaluate, digest)


def make_overlap(cfg: Config, network) -> Estimator:
    """Laughlin-overlap accumulator (reference ``overlap.py:31-70``)."""
    return _overlap_estimator(make_overlap_ratios(cfg, network))


def make_ed_overlap(cfg: Config, network, state: int = 0) -> Estimator:
    """Overlap with the *exact* LLL eigenstate from exact diagonalization.

    Beyond the reference's surface (its only analytic target is the Laughlin
    state): runs ``ed.ed_block`` for the configured system at load time (dense
    path — small/medium blocks) and accumulates
    ``|<psi_ED|psi>|^2 / (<psi_ED|psi_ED><psi|psi>)`` from the same walkers.

    Sector-aware: a checkpoint trained with the Lz penalty at
    ``lz_center = m`` (the magnetoroton workflow, ``scripts/magnetoroton.py``)
    is compared against the exact ground state of the matching ``Lz = m``
    block, so excited-branch states validate with the same estimator.
    """
    from deephall_tpu.networks.edstate import make_ed_network

    two_lz = round(2 * cfg.system.lz_center) if cfg.system.lz_penalty else 0
    ed_network, result = make_ed_network(cfg.system, state=state, two_lz=two_lz)
    logger.info(
        "ED block dim=%d (2Lz=%d), target state %d: E=%.6f (total %.6f)",
        result.dim,
        two_lz,
        state,
        result.energies[state],
        sum(cfg.system.nspins) / 2.0
        + cfg.system.interaction_strength * float(result.energies[state]),
    )
    return _overlap_estimator(make_target_ratios(network, lambda d: ed_network(None, d)))


def _overlap_estimator(ratios) -> Estimator:
    # Split real/imag state: complex cannot cross the TPU host boundary.
    def init(steps: int):
        del steps
        return {
            "ratio_re": jnp.zeros(()),
            "ratio_im": jnp.zeros(()),
            "ratio_square": jnp.zeros(()),
            "count": 0.0,
        }

    def evaluate(params, key, data, state):
        del key
        ratio, ratio_square = ratios(params, data)
        mean_ratio = jnp.nanmean(ratio)
        return {
            "ratio_re": state["ratio_re"] + mean_ratio.real,
            "ratio_im": state["ratio_im"] + mean_ratio.imag,
            "ratio_square": state["ratio_square"] + jnp.nanmean(ratio_square),
            "count": state["count"] + 1.0,
        }

    def digest(state, steps: int):
        del steps
        count = float(jax.device_get(state["count"]))
        ratio = complex(
            float(jax.device_get(state["ratio_re"])),
            float(jax.device_get(state["ratio_im"])),
        ) / count
        ratio_square = float(jax.device_get(state["ratio_square"])) / count
        return {"overlap": np.asarray(abs(ratio) ** 2 / ratio_square)}

    return Estimator(init, evaluate, digest)


def make_structure_factor(cfg: Config, network, lmax: int = 8) -> Estimator:
    """Static structure factor multipoles ``S_L = 1 + (N-1) E_pair[P_L]``.

    Beyond the reference's estimator set.  Exact counterpart for ED states:
    ``observables.ed.structure_factor`` (same definition; the two are pinned
    against each other in ``tests/test_edstate.py``).  ``S_1`` obeys the exact
    LLL identity ``1/(Q+1) + L(L+1)/(N (Q+1)^2)`` — an LLL-occupancy /
    rotation-invariance diagnostic for converged states (LL mixing shows up as
    a measured excess over ``1/(Q+1)``).
    """
    del network
    nelec = sum(cfg.system.nspins)

    def pair_legendre_means(data):
        x = pairwise_cos(data)  # [B, N, N]
        mask = 1.0 - jnp.eye(nelec)
        # P_0 .. P_lmax by the three-term recurrence, averaged over pairs.
        p_prev = jnp.ones_like(x)
        p_cur = x
        means = [jnp.asarray(1.0)]
        for lval in range(1, lmax + 1):
            means.append(jnp.mean(jnp.sum(p_cur * mask, (-2, -1))) / (nelec * (nelec - 1)))
            p_prev, p_cur = p_cur, (
                (2 * lval + 1) * x * p_cur - lval * p_prev
            ) / (lval + 1)
        return jnp.stack(means)

    def init(steps: int):
        del steps
        return {"p_l": jnp.zeros(lmax + 1), "count": 0.0}

    def evaluate(params, key, data, state):
        del params, key
        return {
            "p_l": state["p_l"] + pair_legendre_means(data),
            "count": state["count"] + 1.0,
        }

    def digest(state, steps: int):
        del steps
        p_l = np.asarray(jax.device_get(state["p_l"])) / float(
            jax.device_get(state["count"])
        )
        return {"structure_factor": 1.0 + (nelec - 1) * p_l}

    return Estimator(init, evaluate, digest)


ESTIMATORS = {
    "density": make_density,
    "pair_corr": make_pair_corr,
    "one_rdm": make_one_rdm,
    "overlap": make_overlap,
    "ed_overlap": make_ed_overlap,
    "structure_factor": make_structure_factor,
}
