from sketch_rna_tpu.sketch.fracminhash import (  # noqa: F401
    fracminhash_threshold,
    sketch_batch,
    sketch_scalar,
)
