from sketch_rna_tpu.io.fasta import load_fasta  # noqa: F401
from sketch_rna_tpu.io.fastq import (  # noqa: F401
    iter_fastq_records,
    load_fastq_dict,
    load_fastq_with_quality,
)
from sketch_rna_tpu.io.packing import (  # noqa: F401
    PackedReads,
    encode_sequence,
    is_valid_sequence,
    pack_reads,
)
