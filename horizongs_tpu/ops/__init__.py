from horizongs_tpu.ops.projection import (
    ProjectedGaussians,
    ProjectedSurfels,
    project_3dgs,
    project_2dgs,
)
from horizongs_tpu.ops.reference import (
    render_dense_3dgs,
    render_dense_2dgs,
)
