#!/usr/bin/env bash
# Build + smoke-check (the analogue of the reference's build.sh, which
# compiles the C++ tool and holds example invocations — SURVEY.md §2 C14).
#
#   ./build.sh            build the native library and run the fast tests
#   ./build.sh --full     also run the complete test suite
set -euo pipefail
cd "$(dirname "$0")"

echo "== building native fastio library =="
make -C native

echo "== smoke test: bundled sample dataset =="
JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python -m pytest tests/test_sample_data.py -q

if [[ "${1:-}" == "--full" ]]; then
  echo "== full test suite =="
  python -m pytest tests/ -q
fi

echo "== example invocations =="
cat <<'USAGE'
  # Build an index:
  python -m sketch_rna_tpu.cli -o index -k 31 examples/sample.fa /tmp/sample.skidx.npz
  # Quantify:
  python -m sketch_rna_tpu.cli -o quant /tmp/sample.skidx.npz examples/sample.fq /tmp/out.csv
  # Benchmark (one JSON line):
  python bench.py
USAGE
