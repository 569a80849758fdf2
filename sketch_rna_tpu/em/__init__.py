from sketch_rna_tpu.em.checkpoint import EMState, load_em_state, save_em_state  # noqa: F401
from sketch_rna_tpu.em.classes import group_candidate_rows  # noqa: F401
from sketch_rna_tpu.em.em import (  # noqa: F401
    assign_reads,
    assign_reads_tables,
    run_em,
    run_em_tables,
)
