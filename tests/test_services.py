"""Framework-services tests: logger, monitor, plotting, checkpoint formats,
misc utils, benchmark registry, gym shim, solver caps."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestLogger:
    def test_csv_self_rewriting_header(self, tmp_path):
        from deepmimic_mujoco_tpu.utils import logger

        lg = logger.Logger(
            dir=str(tmp_path),
            output_formats=[logger.CSVOutputFormat(str(tmp_path / "p.csv"))])
        lg.logkv("a", 1)
        lg.dumpkvs()
        lg.logkv("a", 2)
        lg.logkv("b", 3)  # new key → header rewrite
        lg.dumpkvs()
        lg.close()
        lines = (tmp_path / "p.csv").read_text().splitlines()
        assert lines[0] == "a,b"
        assert lines[1] == "1,"
        assert lines[2] == "2,3"

    def test_logkv_mean(self, tmp_path):
        from deepmimic_mujoco_tpu.utils import logger

        lg = logger.Logger(dir=None, output_formats=[])
        lg.logkv_mean("x", 2.0)
        lg.logkv_mean("x", 4.0)
        assert lg.name2val["x"] == pytest.approx(3.0)


class TestMonitor:
    def test_roundtrip(self, tmp_path):
        from deepmimic_mujoco_tpu.utils.monitor import Monitor, load_results

        path = str(tmp_path / "run.monitor.csv")
        m = Monitor(path)
        m.record(10.0, 10)
        m.record(22.5, 22)
        m.close()
        df = load_results(path)
        assert list(df["r"]) == [10.0, 22.5]
        assert list(df["l"]) == [10, 22]


class TestPlotting:
    def test_plot_curve_from_monitor(self, tmp_path):
        from deepmimic_mujoco_tpu.utils.monitor import Monitor
        from deepmimic_mujoco_tpu.utils.plotting import plot_curve, smooth

        d = tmp_path / "logs"
        d.mkdir()
        m = Monitor(str(d / "run.monitor.csv"))
        for i in range(50):
            m.record(float(i), i + 1)
        m.close()
        out = plot_curve(str(d), str(tmp_path / "fig.svg"))
        assert os.path.exists(out)
        s = smooth(np.arange(100.0), 5)
        assert s.shape == (100,)


class TestMisc:
    def test_zipsame(self):
        from deepmimic_mujoco_tpu.utils.misc import zipsame

        assert list(zipsame([1, 2], [3, 4])) == [(1, 3), (2, 4)]
        with pytest.raises(AssertionError):
            list(zipsame([1], [2, 3]))

    def test_boolean_flag(self):
        import argparse

        from deepmimic_mujoco_tpu.utils.misc import boolean_flag

        p = argparse.ArgumentParser()
        boolean_flag(p, "render", default=False)
        assert p.parse_args(["--render"]).render is True
        assert p.parse_args(["--no-render"]).render is False


class TestBenchmarks:
    def test_registry(self):
        from deepmimic_mujoco_tpu.utils import benchmarks

        b = benchmarks.get_benchmark("DeepMimicStandup")
        assert b["tasks"][0]["num_timesteps"] == 1_000_000
        assert "DeepMimicImitation15" in benchmarks.list_benchmarks()
        with pytest.raises(ValueError):
            benchmarks.get_benchmark("nope")


class TestGymShim:
    def test_gymnasium_api(self):
        gymnasium = pytest.importorskip("gymnasium")
        from deepmimic_mujoco_tpu.envs.gym_shim import make

        env = make("DPEnvV3", seed=3)
        ob, info = env.reset()
        assert ob.shape == (56,)
        ob, rew, term, trunc, info = env.step(np.zeros(28, np.float32))
        assert rew == 1.0
        assert isinstance(term, bool)

    def test_registration(self):
        gymnasium = pytest.importorskip("gymnasium")
        from deepmimic_mujoco_tpu.envs.gym_shim import register_gym_envs

        register_gym_envs()
        env = gymnasium.make("HumanoidDeepMimic-v0")
        ob, _ = env.reset(seed=0)
        assert ob.shape == (56,)


class TestSolverCaps:
    def test_capped_equals_full_when_within_cap(self):
        """With few active contacts (standing), the capped solver must return
        identical forces to the full solver."""
        from deepmimic_mujoco_tpu.physics import build_humanoid, engine

        m_full = build_humanoid(contact_cap=1 << 30, limit_cap=1 << 30)
        m_cap = build_humanoid(contact_cap=16, limit_cap=16)
        qp = jnp.asarray(m_full.qpos0).at[2].set(0.87)  # feet touching
        qv = jnp.zeros(34, jnp.float32)
        f_full = engine.forward(m_full, qp, qv, jnp.zeros(28))
        f_cap = engine.forward(m_cap, qp, qv, jnp.zeros(28))
        np.testing.assert_allclose(
            np.asarray(f_cap.qacc), np.asarray(f_full.qacc), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(f_cap.contact_force), np.asarray(f_full.contact_force),
            atol=1e-2)

    def test_default_cap8_tracks_uncapped_prone(self):
        """The r3 default caps (8/8, ne=32) must match the UNCAPPED solve on
        the worst-case contact regime — P-controller tracking of the PRONE
        getup_facedown clip (full study: tools/contactcap_study.py, measured
        ≤2e-6 qpos RMS over 40 steps on walk/spinkick/getup)."""
        import jax

        from deepmimic_mujoco_tpu.envs import DPEnvV3
        from deepmimic_mujoco_tpu.physics import build_humanoid

        trajs = {}
        for name, model in (
            ("full", build_humanoid(contact_cap=1 << 30, limit_cap=1 << 30)),
            ("default", build_humanoid()),
        ):
            env = DPEnvV3(clip="getup_facedown", model=model, n_substeps=1)
            s = env.reset_at(jax.random.PRNGKey(0), 0)
            step = jax.jit(env.step)
            qs = []
            for t in range(12):
                ref = env.clip_qpos[min(t + 1, env.clip_len - 1)][7:]
                s = step(s, 0.8 * (ref - s.qpos[7:]))
                qs.append(np.asarray(s.qpos))
            trajs[name] = np.stack(qs)
        rms = float(np.sqrt(np.mean((trajs["full"] - trajs["default"]) ** 2)))
        assert rms < 1e-4, rms


class TestVecNormalize:
    def test_normalized_rollout(self):
        from deepmimic_mujoco_tpu.envs import DPEnvV3, VectorEnv
        from deepmimic_mujoco_tpu.envs.vec_normalize import VecNormalize

        venv = VectorEnv(DPEnvV3(clip="walk"), num_envs=4)
        vn = VecNormalize(venv, gamma=0.99)
        st = vn.reset(jax.random.PRNGKey(0))
        st, obs, rew, done = vn.step(st, jnp.zeros((4, 28)))
        assert obs.shape == (4, 56)
        assert np.abs(np.asarray(obs)).max() <= 10.0
        assert np.isfinite(np.asarray(rew)).all()


class TestTileImages:
    def test_grid(self):
        from deepmimic_mujoco_tpu.utils.tile_images import tile_images

        imgs = np.ones((3, 4, 5, 3))
        out = tile_images(imgs)
        assert out.shape == (8, 10, 3)  # 2x2 grid of 4x5


class TestPlotResults:
    def test_group_average(self, tmp_path):
        from deepmimic_mujoco_tpu.utils.monitor import Monitor
        from deepmimic_mujoco_tpu.utils.plotting import plot_results

        for run in range(2):
            d = tmp_path / f"run{run}"
            d.mkdir()
            m = Monitor(str(d / "m.monitor.csv"))
            for i in range(40):
                m.record(float(i + run), i + 1)
            m.close()
        out = plot_results(
            str(tmp_path), out_path=str(tmp_path / "fig.svg"),
            group_fn=lambda run: "all", average_group=True)
        assert os.path.exists(out)


class TestTensorBoardFormat:
    def test_tb_format_writes(self, tmp_path):
        import os

        from deepmimic_mujoco_tpu.utils import logger as L

        fmt = L.make_output_format("tensorboard", str(tmp_path))
        fmt.writekvs({"a": 1.0, "b": 2, "s": "skip-me"})
        fmt.writekvs({"a": 3.0})
        fmt.close()
        files = [os.path.join(dp, f) for dp, _, fs in os.walk(tmp_path)
                 for f in fs]
        assert files, "tensorboard format produced no files"
