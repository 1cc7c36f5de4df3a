"""Action distributions (functional JAX).

Mirrors the reference's ``Pd`` family — DiagGaussian, Categorical,
MultiCategorical, Bernoulli — with the same logp/KL/entropy formulas
(/root/reference/src/distributions.py:147-269).  Stateless: parameters are
passed explicitly, sampling takes a PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2PI = jnp.log(2.0 * jnp.pi)
_LOG2PIE = jnp.log(2.0 * jnp.pi * jnp.e)


# ---------------------------------------------------------------------------
# Diagonal Gaussian (the policy head used by MlpPolicy,
# /root/reference/src/mlp_policy_trpo.py:45-52)
# ---------------------------------------------------------------------------
class diag_gaussian:
    @staticmethod
    def neglogp(mean, logstd, x):
        std = jnp.exp(logstd)
        return (
            0.5 * jnp.sum(jnp.square((x - mean) / std), axis=-1)
            + 0.5 * _LOG2PI * x.shape[-1]
            + jnp.sum(logstd, axis=-1)
        )

    @staticmethod
    def logp(mean, logstd, x):
        return -diag_gaussian.neglogp(mean, logstd, x)

    @staticmethod
    def kl(mean_p, logstd_p, mean_q, logstd_q):
        """KL(p ‖ q) — reference distributions.py:228-233."""
        std_p, std_q = jnp.exp(logstd_p), jnp.exp(logstd_q)
        return jnp.sum(
            logstd_q - logstd_p
            + (jnp.square(std_p) + jnp.square(mean_p - mean_q))
            / (2.0 * jnp.square(std_q))
            - 0.5,
            axis=-1,
        )

    @staticmethod
    def entropy(logstd):
        return jnp.sum(logstd + 0.5 * _LOG2PIE, axis=-1)

    @staticmethod
    def sample(key, mean, logstd):
        return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape, mean.dtype)

    @staticmethod
    def mode(mean, logstd):
        return mean


# ---------------------------------------------------------------------------
# Categorical over logits (reference distributions.py:147-186)
# ---------------------------------------------------------------------------
class categorical:
    @staticmethod
    def neglogp(logits, x):
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]

    @staticmethod
    def kl(logits_p, logits_q):
        a0 = logits_p - jnp.max(logits_p, axis=-1, keepdims=True)
        a1 = logits_q - jnp.max(logits_q, axis=-1, keepdims=True)
        ea0, ea1 = jnp.exp(a0), jnp.exp(a1)
        z0 = jnp.sum(ea0, axis=-1, keepdims=True)
        z1 = jnp.sum(ea1, axis=-1, keepdims=True)
        p0 = ea0 / z0
        return jnp.sum(p0 * (a0 - jnp.log(z0) - a1 + jnp.log(z1)), axis=-1)

    @staticmethod
    def entropy(logits):
        a0 = logits - jnp.max(logits, axis=-1, keepdims=True)
        ea0 = jnp.exp(a0)
        z0 = jnp.sum(ea0, axis=-1, keepdims=True)
        p0 = ea0 / z0
        return jnp.sum(p0 * (jnp.log(z0) - a0), axis=-1)

    @staticmethod
    def sample(key, logits):
        return jax.random.categorical(key, logits, axis=-1)

    @staticmethod
    def mode(logits):
        return jnp.argmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Bernoulli over logits (reference distributions.py:246-269)
# ---------------------------------------------------------------------------
class bernoulli:
    @staticmethod
    def neglogp(logits, x):
        x = x.astype(logits.dtype)
        return jnp.sum(
            jnp.maximum(logits, 0) - logits * x + jnp.log1p(jnp.exp(-jnp.abs(logits))),
            axis=-1,
        )

    @staticmethod
    def kl(logits_p, logits_q):
        ps = jax.nn.sigmoid(logits_p)
        return jnp.sum(
            ps * (jax.nn.log_sigmoid(logits_p) - jax.nn.log_sigmoid(logits_q))
            + (1 - ps) * (jax.nn.log_sigmoid(-logits_p) - jax.nn.log_sigmoid(-logits_q)),
            axis=-1,
        )

    @staticmethod
    def entropy(logits):
        ps = jax.nn.sigmoid(logits)
        return jnp.sum(
            -ps * jax.nn.log_sigmoid(logits) - (1 - ps) * jax.nn.log_sigmoid(-logits),
            axis=-1,
        )

    @staticmethod
    def sample(key, logits):
        u = jax.random.uniform(key, logits.shape)
        return (u < jax.nn.sigmoid(logits)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# MultiCategorical: independent categoricals over a low/high box of ints
# (reference distributions.py:188-218)
# ---------------------------------------------------------------------------
class multi_categorical:
    """Parameterized by flat logits split into ``ncats`` per sub-action
    (reference uses low/high per dimension; here sizes = high - low + 1)."""

    @staticmethod
    def _split(logits, sizes):
        out, off = [], 0
        for s in sizes:
            out.append(logits[..., off:off + s])
            off += s
        return out

    @staticmethod
    def neglogp(logits, sizes, x):
        parts = multi_categorical._split(logits, sizes)
        return sum(
            categorical.neglogp(l, x[..., i]) for i, l in enumerate(parts))

    @staticmethod
    def kl(logits_p, logits_q, sizes):
        pp = multi_categorical._split(logits_p, sizes)
        qq = multi_categorical._split(logits_q, sizes)
        return sum(categorical.kl(a, b) for a, b in zip(pp, qq))

    @staticmethod
    def entropy(logits, sizes):
        return sum(
            categorical.entropy(l)
            for l in multi_categorical._split(logits, sizes))

    @staticmethod
    def sample(key, logits, sizes):
        keys = jax.random.split(key, len(sizes))
        parts = multi_categorical._split(logits, sizes)
        return jnp.stack(
            [categorical.sample(k, l) for k, l in zip(keys, parts)], axis=-1)


def make_pdtype(space):
    """Dispatch a gym/gymnasium space to its distribution family + param size
    (reference distributions.py:271-283).  Returns (family, param_size,
    sample_dtype_kind)."""
    name = type(space).__name__
    if name == "Box":
        assert len(space.shape) == 1
        return diag_gaussian, 2 * space.shape[0], "float"
    if name == "Discrete":
        return categorical, int(space.n), "int"
    if name == "MultiDiscrete":
        sizes = [int(n) for n in space.nvec]
        return multi_categorical, sum(sizes), "int"
    if name == "MultiBinary":
        return bernoulli, int(space.n), "int"
    raise NotImplementedError(f"no distribution for space {space!r}")


def validate_probtype(sample_a, neglogp_a, neglogp_b, entropy_a, kl_ab,
                      key, n: int = 100_000):
    """Statistical self-test (reference ``validate_probtype``,
    distributions.py:314-341): over n samples from distribution *a*, the
    estimated NLL must match the analytic entropy, and the estimated
    E_a[log p_a − log p_b] must match KL(a‖b), each within 3σ.

    Callables: ``sample_a(key)->x``; ``neglogp_{a,b}(x)``; scalars
    ``entropy_a`` and ``kl_ab``.  Raises AssertionError on failure; returns
    the two z-scores."""
    import numpy as np

    keys = jax.random.split(key, n)
    xs = jax.vmap(sample_a)(keys)
    nll_a = np.asarray(jax.vmap(neglogp_a)(xs))
    ent_hat, ent_sem = nll_a.mean(), nll_a.std() / np.sqrt(n)
    z_ent = abs(ent_hat - float(entropy_a)) / max(ent_sem, 1e-12)
    assert z_ent < 3.0, (
        f"entropy mismatch: {ent_hat} vs {float(entropy_a)} (z={z_ent:.2f})")

    logp_diff = np.asarray(jax.vmap(neglogp_b)(xs)) - nll_a
    kl_hat, kl_sem = logp_diff.mean(), logp_diff.std() / np.sqrt(n)
    z_kl = abs(kl_hat - float(kl_ab)) / max(kl_sem, 1e-12)
    assert z_kl < 3.0, (
        f"KL mismatch: {kl_hat} vs {float(kl_ab)} (z={z_kl:.2f})")
    return z_ent, z_kl
