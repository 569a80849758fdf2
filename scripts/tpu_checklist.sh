#!/bin/bash
# Serial TPU measurement checklist — run when the axon tunnel is up.
# The TPU is single-tenant: never run two of these concurrently.
# Each step logs to /tmp/tpu_logs/.
#
# Round-3 state: the round-2 decision steps are SETTLED and removed —
#   em_segsum auto policy (profile_em_scatter: segsum 0.08 ms vs scatter
#   24.4 ms at bench shape; parity at the GENCODE shape) and
#   use_pallas_sketch (production A/B: jnp 800.4k vs fused 720.1k vs
#   unfused 795.8k reads/s -> dispatch branch deleted).
# MEASUREMENT HYGIENE: on this backend the first device->host transfer
# permanently degrades host dispatch (~0.7-2 ms/call, docs/DESIGN.md
# "axon dispatch cliff"); profile scripts time everything before any
# transfer, and independent measurements get independent processes.
#
# Tunnel-drop tolerant: if a step fails AND the tunnel probe then
# fails, wait for the tunnel and retry the step once.

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
  timeout 3600 "$@" > "/tmp/tpu_logs/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ] && ! probe; then
    echo "--- $name failed (rc=$rc) with tunnel down; will retry ---" \
      | tee -a /tmp/tpu_logs/checklist.log
    wait_for_tunnel
    timeout 3600 "$@" > "/tmp/tpu_logs/$name.log" 2>&1
    rc=$?
  fi
  echo "--- $name exit $rc ---" | tee -a /tmp/tpu_logs/checklist.log
  tail -20 "/tmp/tpu_logs/$name.log"
}

# 1. Headline bench.  SINGLE CAPTURES JITTER ~25% on this tunnel
#    (round-5 spreads: 667-941k with identical code) — the committed
#    headline is the fresh-process spread median:
run bench_spread python bench.py --standard-spread 5
run bench python bench.py

# 2. GENCODE-scale single-k and multi-k throughput (+ attributed phase
#    split via the sync-phases rerun inside scale_check logs).
run scale_single python scripts/scale_check.py --transcripts 250000 --reads 1000000
run scale_multik python scripts/scale_check.py --transcripts 250000 \
  --reads 1000000 --k 21,31

# 3. Index build at GENCODE scale (CPU-backend default; reference bar
#    52.3 s on this host).  Covered by bench --configs c0 as well.

# 4. 32M-read file-fed streaming run through the real CLI
#    (file from scripts/make_fastq.py; index from the scale cache).
if [ ! -f /tmp/big32m.fq ]; then
  run make32m python scripts/make_fastq.py /tmp/big32m.fq
fi
run stream32m python -m sketch_rna_tpu.cli -o quant \
  /tmp/sketch_scale_cache/T250000_k31.npz /tmp/big32m.fq /tmp/big32m_out.csv

# 5. GENCODE-scale TPU run vs the REAL reference binary's CSV
#    (artifacts from scripts/gencode_parity.py; float32 EM on TPU, so
#    the bar is rank-identical + small float diffs).
if [ -f /tmp/ours250k.npz ] && [ -f /tmp/reads1m.fq ] && [ -f /tmp/refbuild/gencode_out.csv ]; then
  run gencode_tpu python -m sketch_rna_tpu.cli -o quant \
    /tmp/ours250k.npz /tmp/reads1m.fq /tmp/gencode_tpu.csv
  run gencode_tpu_cmp python scripts/compare_csv.py \
    /tmp/gencode_tpu.csv /tmp/refbuild/gencode_out.csv --rel-tol 2e-3
fi

# 6. Full bench config matrix for the round artifact (BENCH_MATRIX.json);
#    --configs-full adds the real GENCODE entries + parity blocks (needs
#    the scale cache and scripts/gencode_parity.py artifacts), then a
#    fresh-process 32M entry replaces the in-matrix one.
run bench_configs python bench.py --configs-full
run stream32m_entry python bench.py --stream32m

# 7. Round-5 measurement probes (all chained/gated — see each script's
#    header for why naive timing lies on this backend):
#    - streaming compute-only bound (no per-chunk H2D):
run stream_compute python scripts/profile_stream_compute.py 16
#    - multi-k stage ablation (gated fused program):
run match_ablate python scripts/profile_match_ablate.py

echo "checklist complete; logs in /tmp/tpu_logs/"
