from sketch_rna_tpu.dist.mesh import make_mesh, mesh_factor  # noqa: F401
from sketch_rna_tpu.dist.quant_sharded import quant_step_sharded  # noqa: F401
