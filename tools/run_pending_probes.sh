#!/bin/bash
# Run the measurements blocked by the 2026-08-17 axon tunnel outage, in
# order, one JAX process at a time (this box has one CPU core).  Safe to
# re-run; aborts early if the tunnel is still down.
#
#   bash tools/run_pending_probes.sh [logdir]
#
# After it finishes, read the logs; if a variant wins its probe, flip the
# matching default in iris_style_transfer_tpu/models/layers.py
# (FUSE_RELU_POOL / USE_MXU_FWD / STATS_TAPS), record accept/reject in
# BASELINE.md's probe log, re-run bench.py (recaptures BENCH_last.json +
# BENCH_extra.json), and commit.
set -e -o pipefail  # pipefail: a probe failing into `tee` must abort, not
                    # continue to a bench recapture against a dead backend
cd "$(dirname "$0")/.."
LOG=${1:-saved/probe_logs}
mkdir -p "$LOG"

if ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8103' 2>/dev/null; then
  echo "axon tunnel still down (127.0.0.1:8103 refused) — nothing to run" >&2
  exit 1
fi

run() {
  name=$1; shift
  echo "== $name =="
  timeout 1800 "$@" 2>&1 | tee "$LOG/$name.log"
}

run probe14 python tools/perf_probe14.py            # Pallas relu+pool bwd
run probe15 python tools/perf_probe15.py            # mxu-fwd + stats-taps @ bench config
run probe16 python tools/perf_probe16.py            # same candidates @ production bs64 config
run probe17 python tools/perf_probe17.py            # Pallas depthwise+BN+SiLU in B7
run bench   python bench.py                         # recapture (flags still at defaults)

echo
echo "done — logs in $LOG; flip winning defaults in models/layers.py,"
echo "update BASELINE.md, re-run bench.py, commit."
