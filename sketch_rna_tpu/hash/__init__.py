from sketch_rna_tpu.hash.nthash import (  # noqa: F401
    NTHASH_SEEDS,
    nthash_batch_u32,
    nthash_forward_scalar,
    nthash_forward_scalar_direct,
    srol,
    window_tables_u32,
)
