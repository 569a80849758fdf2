from sketch_rna_tpu.match.candidates import MatchResult, match_batch  # noqa: F401
from sketch_rna_tpu.match.lookup import expand_postings, lookup_postings  # noqa: F401
