#!/bin/bash
# Round-3 XLA compiler-option sweep on the shipped derived step (serialized;
# chip must be idle — PERF_NOTES methodology note).
#
# The step is aggregate-bandwidth-bound with a ~15-20% tiny-op/latency tail
# (PERF_NOTES round-3 trace). The one compiler-level lever not yet A/B'd is
# fusion sizing: the scoped-VMEM limit (default ~16 MB on this toolchain —
# the pg P=4 kernel hit "16.19M/16M") caps XLA's fusion tile sizes. Options
# are passed per-jit via lower().compile(compiler_options=...) so they reach
# the axon REMOTE compiler; each setting forces a cold compile (~minutes).
cd "$(dirname "$0")/.."
run() {
  echo "== XLA_OPT='$1' =="
  XLA_OPT="$1" TRACE=0 \
    timeout 2400 python experiments/r3_profile_step.py 2>&1 | grep -v WARNING
}
run ""                                         # baseline (cache-warm control)
run "xla_tpu_scoped_vmem_limit_kib=32768"
run "xla_tpu_scoped_vmem_limit_kib=65536"
