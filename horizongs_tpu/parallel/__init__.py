from horizongs_tpu.parallel.mesh import make_mesh
from horizongs_tpu.parallel.step import build_sharded_train_step
