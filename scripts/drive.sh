#!/usr/bin/env bash
# The full pre-snapshot drive (README "Development invariants" /
# .claude/skills/verify): suite, correctness gate at sf0.001 + sf0.01,
# bench at sf0.1. Exits nonzero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 sbt test"
sbt -batch test

echo "== 2/4 Verify + oracle @ sf0.001"
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/drive-verify-001"
python3 scripts/check_oracle.py /root/testdata/sf0.001 /tmp/drive-verify-001

echo "== 3/4 Verify + oracle @ sf0.01"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/drive-verify-01"
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/drive-verify-01

echo "== 4/4 Bench @ sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'

echo "== drive green"
