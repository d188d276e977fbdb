from rtweekend_tpu.parallel.mesh import make_mesh
from rtweekend_tpu.parallel.shard import render_sharded, sharded_train_step

__all__ = ["make_mesh", "render_sharded", "sharded_train_step"]
