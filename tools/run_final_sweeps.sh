#!/bin/bash
# Round-close verification chain: full strict sweep at sf0.01, sf0.001,
# and the DuckDB-side type lint — sequential so the DuckDB spill dirs
# and the Spark JVM never collide.
set -u
cd "$(dirname "$0")/.."
rm -rf .tmp
timeout 3500 python tools/oracle_check.py /root/testdata/sf0.01 \
  > /tmp/oracle_r12_final.txt 2>/dev/null
echo "sf0.01 exit: $?" >> /tmp/oracle_r12_final.txt
rm -rf .tmp
timeout 1800 python tools/oracle_check.py /root/testdata/sf0.001 \
  > /tmp/oracle_r12_sf0001.txt 2>/dev/null
echo "sf0.001 exit: $?" >> /tmp/oracle_r12_sf0001.txt
rm -rf .tmp
timeout 900 python tools/oracle_check.py /root/testdata/sf0.01 --lint-only \
  > /tmp/oracle_r12_lint.txt 2>/dev/null
echo "lint exit: $?" >> /tmp/oracle_r12_lint.txt
rm -rf .tmp
