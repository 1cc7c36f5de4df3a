from deepmimic_mujoco_tpu.parallel.collectives import maybe_pmean, maybe_psum, sync_check  # noqa: F401
from deepmimic_mujoco_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
