#!/bin/bash
# Two back-to-back full-suite bench invocations (the committed
# bench_full.json / bench_full_2.json pair): same code, same suite, so
# the round's spread claim is auditable from two committed files.
set -uo pipefail
cd /root/repo
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_full.json \
  bash scripts/bench_java.sh > /tmp/benchfull_a.log 2>&1
ec1=$?
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_full_2.json \
  bash scripts/bench_java.sh > /tmp/benchfull_b.log 2>&1
ec2=$?
echo "run1=$ec1 run2=$ec2" > /tmp/bench_two_runs.done
