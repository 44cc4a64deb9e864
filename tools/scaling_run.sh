#!/bin/bash
# North-rule scaling evidence: the SAME indexing job (identical input
# parquet, identical partition count = 384) at two parallelism levels.
# The sandbox host has noisy-neighbor interference (2-3x swings between
# identical runs), so each level runs twice in ALTERNATING order and the
# best-of-two per level is kept — both levels get equal treatment.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_BENCH_PAGES=1000000
export SPARK_GRAFT_INDEX_PARTS=384
export SPARK_GRAFT_BENCH_SCALING=1
export SPARK_GRAFT_SHUFFLE_PARTITIONS=384
for round in 1 2; do
  for cpus in 8 32; do
    rm -rf /tmp/es_bench_index_c${cpus}_n1000000
    SPARK_GRAFT_CPUS=$cpus python bench.py 2>/dev/null | tail -1 \
      > /root/repo/BENCH/scaling_c${cpus}_r${round}.json
  done
done
python - <<'PY'
import json, shutil
for cpus in (8, 32):
    runs = []
    for rnd in (1, 2):
        with open(f"/root/repo/BENCH/scaling_c{cpus}_r{rnd}.json") as f:
            runs.append(json.load(f))
    best = max(runs, key=lambda d: d["index_docs_per_sec"])
    best["runs_docs_per_sec"] = [r["index_docs_per_sec"] for r in runs]
    with open(f"/root/repo/BENCH/scaling_c{cpus}.json", "w") as f:
        json.dump(best, f)
t8 = json.load(open("/root/repo/BENCH/scaling_c8.json"))["index_docs_per_sec"]
t32 = json.load(open("/root/repo/BENCH/scaling_c32.json"))["index_docs_per_sec"]
print("best c8:", t8, "best c32:", t32, "efficiency:", round(t32 / t8 / 4, 3))
PY
echo DONE
