#!/bin/bash
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_BENCH_PAGES=200000
SPARK_GRAFT_CPUS=8  python bench.py 2>/dev/null | tail -1 > /root/repo/BENCH/scaling_c8.json
SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null | tail -1 > /root/repo/BENCH/scaling_c32.json
echo DONE
