#!/bin/bash
# Round-close verification chain: full strict sweep at sf0.01, sf0.001,
# and the DuckDB-side type lint — sequential so the DuckDB spill dirs
# and the Spark JVM never collide.
#   tools/run_final_sweeps.sh [tag]    # output files /tmp/oracle_<tag>_*.txt
set -u
TAG="${1:-final}"
cd "$(dirname "$0")/.."
rm -rf .tmp
timeout 3500 python tools/oracle_check.py /root/testdata/sf0.01 \
  > "/tmp/oracle_${TAG}_sf001.txt" 2>/dev/null
echo "sf0.01 exit: $?" >> "/tmp/oracle_${TAG}_sf001.txt"
rm -rf .tmp
timeout 1800 python tools/oracle_check.py /root/testdata/sf0.001 \
  > "/tmp/oracle_${TAG}_sf0001.txt" 2>/dev/null
echo "sf0.001 exit: $?" >> "/tmp/oracle_${TAG}_sf0001.txt"
rm -rf .tmp
timeout 900 python tools/oracle_check.py /root/testdata/sf0.01 --lint-only \
  > "/tmp/oracle_${TAG}_lint.txt" 2>/dev/null
echo "lint exit: $?" >> "/tmp/oracle_${TAG}_lint.txt"
rm -rf .tmp
