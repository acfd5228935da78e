#!/bin/bash
# Lexical champion guarantee at sf1 on realistic (Zipfian) text:
# champion ranking must equal the exhaustive ranking hash-for-hash.
# Record the printed [zipf_gate] line as a round row in BASELINE.md.
#
# Usage: tools/zipf_gate.sh   (env: SF1Z=/tmp/sf1_zipf CPUS=32 C=128)
set -euo pipefail
cd "$(dirname "$0")/.."

SF1Z="${SF1Z:-/tmp/sf1_zipf}"
CPUS="${CPUS:-32}"
C="${C:-128}"

if [ ! -d "$SF1Z/documents.parquet" ]; then
  echo "[zipf_gate] tiling sf0.1 x10 with Zipfian text -> $SF1Z"
  SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 $SF1Z 10 zipf" 2>&1 | grep '\[scale\]'
fi

SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.LexicalZipfGate $SF1Z $C" 2>&1 | grep '\[zipf_gate\]'
