"""Model-layer tests: distributions (statistical self-tests mirroring the
reference's validate_probtype, distributions.py:314-341), running stats,
policy shapes/init."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # core-invariant tier (see pyproject markers)

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import MlpPolicy, distributions
from deepmimic_mujoco_tpu.utils import running_stats


class TestDiagGaussian:
    def test_neglogp_matches_entropy_statistically(self):
        """E[-log p(x)] ≈ H within 3 sigma over many samples
        (reference validate_probtype)."""
        key = jax.random.PRNGKey(0)
        mean = jnp.asarray([0.3, -0.1, 0.7])
        logstd = jnp.asarray([0.2, -0.3, 0.0])
        n = 100_000
        keys = jax.random.split(key, n)
        xs = jax.vmap(lambda k: distributions.diag_gaussian.sample(k, mean, logstd))(keys)
        nlp = distributions.diag_gaussian.neglogp(mean, logstd, xs)
        ent = float(distributions.diag_gaussian.entropy(logstd))
        est = float(jnp.mean(nlp))
        stderr = float(jnp.std(nlp)) / np.sqrt(n)
        assert abs(est - ent) < 3 * stderr + 1e-3

    def test_kl_identity_zero(self):
        mean = jnp.asarray([1.0, 2.0])
        logstd = jnp.asarray([0.1, -0.2])
        kl = distributions.diag_gaussian.kl(mean, logstd, mean, logstd)
        assert float(kl) == pytest.approx(0.0, abs=1e-6)

    def test_kl_statistical(self):
        """KL(p,q) ≈ E_p[log p - log q] within 3 sigma."""
        key = jax.random.PRNGKey(1)
        mp, sp = jnp.asarray([0.0, 0.5]), jnp.asarray([0.1, -0.1])
        mq, sq = jnp.asarray([0.2, 0.3]), jnp.asarray([-0.2, 0.2])
        n = 100_000
        keys = jax.random.split(key, n)
        xs = jax.vmap(lambda k: distributions.diag_gaussian.sample(k, mp, sp))(keys)
        lp = distributions.diag_gaussian.logp(mp, sp, xs)
        lq = distributions.diag_gaussian.logp(mq, sq, xs)
        kl_est = float(jnp.mean(lp - lq))
        kl = float(distributions.diag_gaussian.kl(mp, sp, mq, sq))
        stderr = float(jnp.std(lp - lq)) / np.sqrt(n)
        assert abs(kl_est - kl) < 3 * stderr + 1e-3


class TestCategorical:
    def test_entropy_statistical(self):
        key = jax.random.PRNGKey(2)
        logits = jnp.asarray([0.2, 0.4, -0.1, 0.9])
        n = 100_000
        keys = jax.random.split(key, n)
        xs = jax.vmap(lambda k: distributions.categorical.sample(k, logits))(keys)
        nlp = distributions.categorical.neglogp(
            jnp.broadcast_to(logits, (n, 4)), xs)
        ent = float(distributions.categorical.entropy(logits))
        est = float(jnp.mean(nlp))
        stderr = float(jnp.std(nlp)) / np.sqrt(n)
        assert abs(est - ent) < 3 * stderr + 1e-3


class TestRunningStats:
    def test_matches_numpy_moments(self):
        rng = np.random.RandomState(0)
        rms = running_stats.init((4,))
        chunks = [rng.randn(50, 4) * 2.0 + 1.5 for _ in range(5)]
        for c in chunks:
            rms = running_stats.update(rms, jnp.asarray(c, jnp.float32))
        allx = np.concatenate(chunks)
        np.testing.assert_allclose(np.asarray(rms.mean), allx.mean(0), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(rms.var), allx.var(0), rtol=2e-2, atol=1e-3)

    def test_normalize_clips(self):
        rms = running_stats.init((2,))
        out = running_stats.normalize(rms, jnp.asarray([1e9, -1e9]))
        np.testing.assert_allclose(np.asarray(out), [5.0, -5.0])


class TestMlpPolicy:
    def test_shapes_and_param_split(self):
        policy = MlpPolicy(ob_dim=56, ac_dim=28)
        params = policy.init(jax.random.PRNGKey(0))
        assert params["logstd"].shape == (28,)
        ob = jnp.zeros((7, 56))
        mean, logstd = policy.mean_logstd(params, ob)
        assert mean.shape == (7, 28) and logstd.shape == (7, 28)
        assert policy.value(params, ob).shape == (7,)

    def test_act_deterministic_equals_mean(self):
        policy = MlpPolicy(ob_dim=4, ac_dim=2)
        params = policy.init(jax.random.PRNGKey(0))
        ob = jnp.ones(4)
        ac, v = policy.act(params, jax.random.PRNGKey(1), ob, stochastic=False)
        mean, _ = policy.mean_logstd(params, ob)
        np.testing.assert_allclose(np.asarray(ac), np.asarray(mean))

    def test_final_layer_small_init(self):
        """Policy mean head final layer scaled 0.01 (mlp_policy_trpo.py:47)."""
        policy = MlpPolicy(ob_dim=10, ac_dim=5)
        params = policy.init(jax.random.PRNGKey(0))
        w_pol = np.asarray(params["pol"][-1]["w"])
        w_vf = np.asarray(params["vf"][-1]["w"])
        assert np.abs(w_pol).max() < 0.02
        assert np.abs(w_vf).max() > 0.05


class TestValidateProbtype:
    """The reference's statistical self-test harness
    (distributions.py:292-341) applied to each family."""

    def test_diag_gaussian(self):
        d = distributions.diag_gaussian
        mean_a, logstd_a = jnp.array([0.3, -0.7]), jnp.array([-0.2, 0.1])
        mean_b, logstd_b = jnp.array([0.1, -0.2]), jnp.array([0.0, -0.3])
        distributions.validate_probtype(
            lambda k: d.sample(k, mean_a, logstd_a),
            lambda x: d.neglogp(mean_a, logstd_a, x),
            lambda x: d.neglogp(mean_b, logstd_b, x),
            d.entropy(logstd_a),
            d.kl(mean_a, logstd_a, mean_b, logstd_b),
            jax.random.PRNGKey(0), n=50_000)

    def test_categorical(self):
        d = distributions.categorical
        la = jnp.array([0.2, -0.3, 0.5])
        lb = jnp.array([-0.1, 0.4, 0.0])
        distributions.validate_probtype(
            lambda k: d.sample(k, la),
            lambda x: d.neglogp(la, x),
            lambda x: d.neglogp(lb, x),
            d.entropy(la), d.kl(la, lb), jax.random.PRNGKey(1), n=50_000)

    def test_multi_categorical(self):
        d = distributions.multi_categorical
        sizes = (3, 4)
        la = jnp.array([0.2, -0.3, 0.5, 0.0, 0.1, -0.2, 0.3])
        lb = jnp.array([-0.1, 0.4, 0.0, 0.2, -0.5, 0.1, 0.0])
        distributions.validate_probtype(
            lambda k: d.sample(k, la, sizes),
            lambda x: d.neglogp(la, sizes, x),
            lambda x: d.neglogp(lb, sizes, x),
            d.entropy(la, sizes), d.kl(la, lb, sizes),
            jax.random.PRNGKey(2), n=50_000)

    def test_bernoulli(self):
        d = distributions.bernoulli
        la = jnp.array([0.3, -0.6])
        lb = jnp.array([-0.2, 0.4])
        distributions.validate_probtype(
            lambda k: d.sample(k, la),
            lambda x: d.neglogp(la, x),
            lambda x: d.neglogp(lb, x),
            d.entropy(la), d.kl(la, lb), jax.random.PRNGKey(3), n=50_000)

    def test_make_pdtype_dispatch(self):
        gym = pytest.importorskip("gymnasium")
        fam, size, kind = distributions.make_pdtype(
            gym.spaces.Box(low=-1.0, high=1.0, shape=(5,)))
        assert fam is distributions.diag_gaussian and size == 10 and kind == "float"
        fam, size, kind = distributions.make_pdtype(gym.spaces.Discrete(4))
        assert fam is distributions.categorical and size == 4
        fam, size, kind = distributions.make_pdtype(
            gym.spaces.MultiDiscrete([3, 4]))
        assert fam is distributions.multi_categorical and size == 7
        fam, size, kind = distributions.make_pdtype(gym.spaces.MultiBinary(6))
        assert fam is distributions.bernoulli and size == 6
