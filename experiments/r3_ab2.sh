#!/bin/bash
# Round-3 step A/B #2: flat optimizer x conv lowering x GN stats.
# Serialized; chip must be otherwise idle (PERF_NOTES methodology note).
cd "$(dirname "$0")/.."
run () {
  echo "== FLAT=$1 NAS3D_CONV_MODE=$2 NAS3D_GN_STATS=$3 =="
  FLAT=$1 NAS3D_CONV_MODE=$2 NAS3D_GN_STATS=$3 TRACE=0 \
    timeout 2400 python experiments/r3_profile_step.py 2>/dev/null
}
run 0 auto xla
run 1 auto xla
run 1 d2c xla
run 1 auto dot
run 1 d2c dot
