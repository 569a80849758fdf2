from sketch_rna_tpu.em.em import assign_reads, run_em  # noqa: F401
