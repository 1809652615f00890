#!/bin/bash
# Round-3 A/B of the derived step: GN stats formulation x conv lowering.
# Serialized (chip benches must run alone — PERF_NOTES methodology note).
cd "$(dirname "$0")/.."
for cfg in "xla auto" "dot auto" "xla d2c" "dot d2c"; do
  set -- $cfg
  echo "== NAS3D_GN_STATS=$1 NAS3D_CONV_MODE=$2 =="
  NAS3D_GN_STATS=$1 NAS3D_CONV_MODE=$2 TRACE=0 \
    timeout 2400 python experiments/r3_profile_step.py 2>&1 | grep -v WARNING
done
