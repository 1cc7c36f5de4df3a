"""Golden-physics backend: real MuJoCo stepping behind a host callback.

The JAX engine (``physics/engine.py``) is the TPU compute path; this module
wraps the installed MuJoCo C engine as a *drop-in dynamics function* with the
same ``(qpos, qvel, ctrl) → (qpos, qvel)`` signature, callable from inside
jitted/vmapped programs via ``jax.pure_callback``.  Uses:

* A/B physics experiments: train the same jitted TRPO/GAIL stack with MuJoCo
  dynamics to isolate "engine fidelity" from "trainer correctness"
  (the reference's engine is MuJoCo 2.0 via mujoco_py —
  /root/reference/src/dp_env_v3.py:10).
* Golden trajectory generation for regression tests.

CPU-backend only (callbacks run on host; don't put this on a TPU hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from deepmimic_mujoco_tpu.physics.model import PhysicsModel


@functools.lru_cache(maxsize=8)
def _mj_handles(xml: str):
    import mujoco

    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    return m, d


@functools.lru_cache(maxsize=8)
def _mj_pool(xml: str, n_threads: int):
    """Per-thread MjData copies + executor (mj_step releases the GIL)."""
    from concurrent.futures import ThreadPoolExecutor

    import mujoco

    m, _ = _mj_handles(xml)
    datas = [mujoco.MjData(m) for _ in range(n_threads)]
    return ThreadPoolExecutor(max_workers=n_threads), datas


class MJHostDynamics:
    """MuJoCo stepping as a pure batched host function.

    ``xml`` defaults to the MJCF export of ``model`` (physics/humanoid.py
    ``to_mjcf``) so both engines simulate the *same* system; pass an explicit
    MJCF string to simulate a different one (e.g. the upstream asset).
    """

    def __init__(self, model: PhysicsModel, xml: str | None = None):
        if xml is None:
            from deepmimic_mujoco_tpu.physics.humanoid import to_mjcf

            xml = to_mjcf(model, timestep=float(model.dt))
        self.xml = xml
        self.model = model
        m, _ = _mj_handles(xml)
        assert m.nq == model.nq and m.nv == model.nv, (
            f"MJCF/model mismatch: nq {m.nq} vs {model.nq}, nv {m.nv} vs {model.nv}")

    # -- host side -------------------------------------------------------
    def _host_step(self, qpos, qvel, ctrl, n_substeps: int):
        import mujoco

        m, d = _mj_handles(self.xml)
        qpos = np.asarray(qpos, np.float64)
        qvel = np.asarray(qvel, np.float64)
        ctrl = np.asarray(ctrl, np.float64)
        shape = qpos.shape
        qp = qpos.reshape(-1, m.nq)
        qv = qvel.reshape(-1, m.nv)
        ct = ctrl.reshape(-1, m.nu)
        out_qp = np.empty_like(qp)
        out_qv = np.empty_like(qv)
        B = qp.shape[0]
        n_threads = min(8, B) if B > 1 else 1
        pool, datas = _mj_pool(self.xml, n_threads)

        def run_slice(t):
            dd = datas[t]
            for i in range(t, B, n_threads):
                dd.qpos[:] = qp[i]
                dd.qvel[:] = qv[i]
                dd.ctrl[:] = ct[i]
                mujoco.mj_step(m, dd, nstep=n_substeps)
                out_qp[i] = dd.qpos
                out_qv[i] = dd.qvel

        if n_threads == 1:
            run_slice(0)
        else:
            list(pool.map(run_slice, range(n_threads)))
        return (out_qp.reshape(shape).astype(np.float32),
                out_qv.reshape(qvel.shape).astype(np.float32))

    # -- device side -----------------------------------------------------
    def step(self, qpos: jnp.ndarray, qvel: jnp.ndarray, ctrl: jnp.ndarray,
             n_substeps: int = 1):
        """jit/vmap-safe: same contract as ``engine.step(model, ...)``."""
        result_shape = (
            jax.ShapeDtypeStruct(qpos.shape, jnp.float32),
            jax.ShapeDtypeStruct(qvel.shape, jnp.float32),
        )
        return jax.pure_callback(
            functools.partial(self._host_step, n_substeps=n_substeps),
            result_shape, qpos, qvel, ctrl,
            vmap_method="expand_dims",
        )
