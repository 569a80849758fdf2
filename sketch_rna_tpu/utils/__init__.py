from sketch_rna_tpu.utils.timing import PhaseTimer, phase  # noqa: F401
from sketch_rna_tpu.utils.profiling import maybe_trace  # noqa: F401
