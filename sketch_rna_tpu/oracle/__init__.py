from sketch_rna_tpu.oracle.reference_oracle import (  # noqa: F401
    oracle_assign,
    oracle_build_index,
    oracle_em,
    oracle_quant,
    oracle_sparse_chain,
)
