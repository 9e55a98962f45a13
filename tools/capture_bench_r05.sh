#!/bin/bash
# One-shot round-5 on-chip capture: per-config bench + phase profile +
# dispatch-amortization + TPU-vs-CPU smoke. Run from the repo root with
# the DEFAULT environment (no JAX_PLATFORMS — the axon tunnel ignores
# it anyway; gates read jax.default_backend()).
set -u
out=${1:-/tmp/bench_r05}
mkdir -p "$out"
for cfg in default science weno weno_mom hydro_vi sw8192 cs_global; do
  echo "== $cfg"
  BENCH_CONFIG=$cfg timeout 1200 python bench.py \
    > "$out/$cfg.json" 2> "$out/$cfg.log"
  tail -1 "$out/$cfg.json"
done
echo "== phases"
timeout 1200 python tools/bench_nonhydro_phases.py \
  > "$out/phases.txt" 2>&1
tail -12 "$out/phases.txt"
echo "== dispatch"
timeout 1200 python tools/bench_simulation_dispatch.py \
  > "$out/dispatch.txt" 2>&1
tail -4 "$out/dispatch.txt"
echo "== smoke"
timeout 2400 python tools/tpu_smoke.py > "$out/smoke.txt" 2>&1
tail -12 "$out/smoke.txt"
