#!/bin/bash
# Round-5 north-rule scaling evidence — same protocol as round 4
# (BENCH/BASELINE.md): identical input (2M deterministic pages), pinned
# 384 partitions, c2 vs c8 alternating x2, best-of-two per level.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_BENCH_PAGES=2000000
export SPARK_GRAFT_INDEX_PARTS=384
export SPARK_GRAFT_BENCH_SCALING=1
export SPARK_GRAFT_SHUFFLE_PARTITIONS=384
for round in 1 2; do
  for cpus in 2 8; do
    rm -rf /tmp/es_bench_index_c${cpus}_n2000000
    SPARK_GRAFT_CPUS=$cpus python bench.py 2>/dev/null | tail -1 \
      > /root/repo/BENCH/scaling_r5_c${cpus}_r${round}.json
  done
done
python - <<'PY'
import json
best = {}
for cpus in (2, 8):
    runs = [json.load(open(f"/root/repo/BENCH/scaling_r5_c{cpus}_r{r}.json"))
            for r in (1, 2)]
    best[cpus] = max(r["index_docs_per_sec"] for r in runs)
    print(f"c{cpus} runs:", [r["index_docs_per_sec"] for r in runs])
print("best c2:", best[2], "best c8:", best[8],
      "efficiency:", round(best[8] / best[2] / 4, 3))
PY
echo DONE
