from sketch_rna_tpu.index.artifact import IndexArtifact, load_index, save_index  # noqa: F401
from sketch_rna_tpu.index.build import build_index  # noqa: F401
