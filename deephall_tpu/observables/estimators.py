"""Observable estimators: density, pair correlation, 1-RDM, Laughlin overlap.

Functional (state-in, state-out) re-implementations of the reference's netobs
estimators (``/root/reference/deephall/netobs_bridge/observables/``), usable both from
the standalone runner (``deephall_tpu.observables.runner``) and from the netobs bridge.
Each estimator is a pair of pure functions so the accumulation loop jits and shards
over the global walker mesh like everything else in the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import numpy as np
from jax import numpy as jnp

from deephall_tpu.config import Config
from deephall_tpu.geometry import pairwise_cos
from deephall_tpu.networks import make_network
from deephall_tpu.observables.harmonics import make_monopole_harm


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
    """Histogram of theta over [0, pi] (density profile sanity check).

    Reference ``observables/density.py:24-48``.
    """
    del network

    def init(steps: int):
        del steps
        return {"map": jnp.zeros(bins)}

    def evaluate(params, key, data, state):
        del params, key
        theta = jnp.reshape(data[..., 0], (-1,))
        hist, _ = jnp.histogram(theta, bins, range=(0.0, float(jnp.pi)))
        return {"map": state["map"] + hist}

    def digest(state, steps: int):
        del steps
        return {"map": np.asarray(jax.device_get(state["map"]))}

    return Estimator(init, evaluate, digest)


def make_pair_corr(cfg: Config, network, bins: int = 200) -> Estimator:
    """Pair correlation g(theta_12), 1/sin-weighted histogram of pairwise angles.

    Reference ``observables/pair_corr.py:29-64``.
    """
    del network
    nelec = sum(cfg.system.nspins)
    iu = jnp.triu_indices(nelec, 1)

    def init(steps: int):
        del steps
        return {"pair_corr": jnp.zeros(bins)}

    def evaluate(params, key, data, state):
        del params, key
        batch_size = data.shape[0]
        cos12 = pairwise_cos(data)
        theta12 = jnp.arccos(jnp.clip(cos12[:, iu[0], iu[1]], -1, 1)).reshape(-1)
        # Floor the 1/sin weight: exactly (anti)parallel pairs are measure-zero but
        # reachable at f32 and would inject infinities into the histogram.
        weights = 1 / jnp.maximum(jnp.sin(theta12), 1e-6)
        to_add, _ = jnp.histogram(
            theta12, bins, range=(0, float(jnp.pi)), weights=weights
        )
        # Factor 2 from (i != j) -> (i < j); normalised per evaluation step.
        update = to_add * 4 * bins / batch_size / nelec**2 / jnp.pi
        return {"pair_corr": state["pair_corr"] + update}

    def digest(state, steps: int):
        return {"pair_corr": np.asarray(jax.device_get(state["pair_corr"])) / steps}

    return Estimator(init, evaluate, digest)


def make_one_rdm(cfg: Config, network) -> Estimator:
    """One-body reduced density matrix in the monopole-harmonics LLL basis.

    Off-diagonal insertion of r' per electron via the diagonal trick and wavefunction
    ratios (reference ``observables/one_rdm.py:65-119``).
    """
    Q = cfg.system.flux / 2
    norb = cfg.system.flux + 1
    orbitals = [make_monopole_harm(Q, Q, m) for m in np.arange(-Q, Q + 1)]
    nelec = sum(cfg.system.nspins)

    def eval_product(params, data, r_prime):
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

    batch_product = jax.vmap(eval_product, in_axes=(None, 0, 0))

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
        batch = data.shape[:1]
        k1, k2 = jax.random.split(key)
        theta = jnp.arccos(jax.random.uniform(k1, batch, minval=-1, maxval=1))
        phi = jax.random.uniform(k2, batch, minval=-jnp.pi, maxval=jnp.pi)
        r_prime = jnp.stack([theta, phi], axis=-1)[:, None, :]
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
    """Squared overlap |<psi|phi_Laughlin>|^2 via importance-sampled ratios.

    Reference ``observables/overlap.py:31-70``: overlap = |E[r]|^2 / E[|r|^2] with
    r = exp(log phi - log psi - shift) and a mean shift for numerical stability.
    """
    laughlin = make_network(
        cfg.system, dataclasses.replace(cfg.network, type="laughlin")
    )

    # Split real/imag state: complex cannot cross the TPU host boundary.
    def init(steps: int):
        return {
            "ratio_re": jnp.zeros(()),
            "ratio_im": jnp.zeros(()),
            "ratio_square": jnp.zeros(()),
            "count": 0.0,
        }

    def evaluate(params, key, data, state):
        del key
        logpsi = network(params, data)
        logphi = laughlin.apply({}, data)
        shift = jnp.mean((logphi - logpsi).real)
        ratio = jnp.exp(logphi - logpsi - shift)
        mean_ratio = jnp.nanmean(ratio)
        return {
            "ratio_re": state["ratio_re"] + mean_ratio.real,
            "ratio_im": state["ratio_im"] + mean_ratio.imag,
            "ratio_square": state["ratio_square"] + jnp.nanmean(jnp.abs(ratio) ** 2),
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


ESTIMATORS = {
    "density": make_density,
    "pair_corr": make_pair_corr,
    "one_rdm": make_one_rdm,
    "overlap": make_overlap,
}
