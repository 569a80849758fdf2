#!/bin/bash
# Serial TPU measurement checklist — run when the axon tunnel is back.
# The TPU is single-tenant: never run two of these concurrently.
# Each step logs to /tmp/tpu_logs/; later steps depend on earlier
# decisions (segsum / pallas policies), so READ the logs between steps
# when running interactively.
#
# Tunnel-drop tolerant: if a step fails AND the tunnel probe then
# fails, we wait for the tunnel to return and retry the step once.

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_logs

probe() {
  timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1
}

wait_for_tunnel() {
  until probe; do
    echo "[checklist] tunnel down, waiting... $(date)" | tee -a /tmp/tpu_logs/checklist.log
    sleep 240
  done
}

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a /tmp/tpu_logs/checklist.log
  timeout 3000 "$@" > "/tmp/tpu_logs/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ] && ! probe; then
    echo "--- $name failed (rc=$rc) with tunnel down; will retry ---" \
      | tee -a /tmp/tpu_logs/checklist.log
    wait_for_tunnel
    timeout 3000 "$@" > "/tmp/tpu_logs/$name.log" 2>&1
    rc=$?
  fi
  echo "--- $name exit $rc ---" | tee -a /tmp/tpu_logs/checklist.log
  tail -20 "/tmp/tpu_logs/$name.log"
}

# 1. Is the segsum EM path faster than the scatter on-chip?
#    (decides resolve_em_segsum's auto policy)
run em_scatter_bench python scripts/profile_em_scatter.py 204800 16 50000
run em_scatter_gencode python scripts/profile_em_scatter.py 85000 16 250000

# 2. Does the fused Pallas sketch kernel beat XLA hash + row sorts?
#    (decides use_pallas_sketch's default)
run sketch_bench python scripts/profile_sketch.py 8192 256 31
run sketch_multik python scripts/profile_sketch.py 8192 256 21,31

# 3. Multi-k component split at GENCODE scale (cached programs only).
run multik_split python scripts/profile_multik_cached.py \
  /tmp/sketch_scale_cache/T250000_k21_31.npz

# 4. Headline bench (compare vs BENCH_r01 752.9k / 1.20x).
run bench python bench.py

# 5. GENCODE-scale single-k and multi-k throughput.
run scale_single python scripts/scale_check.py --transcripts 250000 \
  --reads 1000000
run scale_multik python scripts/scale_check.py --transcripts 250000 \
  --reads 1000000 --k 21,31

# 6. 32M-read file-fed streaming run through the real CLI
#    (file from scripts/make_fastq.py; index from the scale cache).
run stream32m python -m sketch_rna_tpu.cli -o quant \
  /tmp/sketch_scale_cache/T250000_k31.npz /tmp/big32m.fq /tmp/big32m_out.csv

# 6b. GENCODE-scale TPU run vs the REAL reference binary's CSV
#     (artifacts from the round-2 CPU parity session; float32 EM on
#     TPU, so the bar is rank-identical + small float diffs).
if [ -f /tmp/ours250k.npz ] && [ -f /tmp/reads1m.fq ] && [ -f /tmp/refbuild/gencode_out.csv ]; then
  run gencode_tpu python -m sketch_rna_tpu.cli -o quant \
    /tmp/ours250k.npz /tmp/reads1m.fq /tmp/gencode_tpu.csv
  run gencode_tpu_cmp python scripts/compare_csv.py \
    /tmp/gencode_tpu.csv /tmp/refbuild/gencode_out.csv --rel-tol 2e-3
fi

# 7. Full bench config matrix for the round artifact.
run bench_configs python bench.py --configs

echo "checklist complete; logs in /tmp/tpu_logs/"
