#!/bin/bash
# Serial bench sweep over batch/mode/dataset (ONE TPU process at a time —
# concurrent TPU processes stall for minutes through the axon runtime).
# Results accumulate as "# env…" + JSON-line pairs in $OUT (default
# /tmp/sweep_bench.jsonl). Each point is bench.py's steady-state
# measurement; the default (no-override) run also embeds the h36m
# secondary record, matching what the round driver captures.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/sweep_bench.jsonl}
: > "$OUT"
run() {
  echo "# $*" >> "$OUT"
  env "$@" timeout 1700 python bench.py 2>/dev/null | tail -1 >> "$OUT"
}
run BENCH_DATASET=fashion BENCH_BATCH=8
run BENCH_DATASET=fashion BENCH_BATCH=16
run BENCH_DATASET=fashion BENCH_BATCH=24
run BENCH_DATASET=fashion BENCH_BATCH=32
run BENCH_DATASET=fashion BENCH_BATCH=48
run BENCH_DATASET=fashion BENCH_BATCH=64
run BENCH_DATASET=fashion BENCH_MODE=infer BENCH_BATCH=8
run BENCH_DATASET=fashion BENCH_MODE=infer BENCH_BATCH=16
run BENCH_DATASET=fashion BENCH_MODE=infer BENCH_BATCH=24
run BENCH_DATASET=fashion BENCH_MODE=infer BENCH_BATCH=32
run BENCH_DATASET=fashion BENCH_MODE=infer BENCH_BATCH=48
run BENCH_DATASET=fashion BENCH_MODE=infer BENCH_BATCH=64
# the reference's ACTUAL headline recipe: VGG block1_conv2 content loss +
# nn_loss area 5 + l1_w 1.0 (src_deformable/commands:9)
run BENCH_DATASET=fashion BENCH_BATCH=16 BENCH_CONTENT=block1_conv2
run BENCH_DATASET=fashion BENCH_BATCH=32 BENCH_CONTENT=block1_conv2
run BENCH_DATASET=h36m BENCH_MODE=infer BENCH_BATCH=16
run BENCH_DATASET=h36m BENCH_MODE=infer BENCH_BATCH=48
run BENCH_DATASET=h36m BENCH_BATCH=16
run BENCH_DATASET=h36m BENCH_BATCH=32
run BENCH_DATASET=h36m BENCH_BATCH=48
run BENCH_DATASET=h36m BENCH_BATCH=64
echo done >> "$OUT"
