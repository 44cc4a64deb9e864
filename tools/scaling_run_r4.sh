#!/bin/bash
# Round-4 scaling pair: alternating best-of-two, N=2 -> 4N=8 cores,
# 2M pages, 384 pinned partitions (identical segments/shuffle at both
# levels; only the core count varies — the north rule's two-cluster-size
# criterion evidenced at two parallelism levels).
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
      > /root/repo/BENCH/scaling_r4_c${cpus}_r${round}.json
  done
done
python - <<'PY'
import json
t = {}
for c in (2, 8):
    runs = [json.load(open(f"/root/repo/BENCH/scaling_r4_c{c}_r{r}.json")) for r in (1, 2)]
    t[c] = max(r["index_docs_per_sec"] for r in runs)
    print(f"c{c}: best {t[c]} of {[r['index_docs_per_sec'] for r in runs]} probes {[r['membw_probe_s'] for r in runs]}")
print("efficiency 2->8:", round(t[8]/t[2]/4, 3))
PY
echo DONE
