#!/usr/bin/env bash
# All test lanes in one place (VERDICT r3 weak #7: "a check that never
# runs is a check that will rot").  Usage:
#
#   scripts/run_checks.sh            # default CPU suite        (~25 min)
#   scripts/run_checks.sh slow      # + RUN_SLOW statistical lane (~+5 min)
#   scripts/run_checks.sh tpu       # RUN_TPU hardware lane (real chip; ~10 min,
#                                   #   dominated by first-compile; probe the
#                                   #   tunnel first — see CLAUDE.md)
#   scripts/run_checks.sh all       # everything, sequentially (never run the
#                                   #   CPU suite concurrently with a TPU job:
#                                   #   the local compile helper shares the host)
set -euo pipefail
cd "$(dirname "$0")/.."
lane="${1:-default}"

run_default() {
    echo "== default CPU suite (virtual 8-device mesh, x64) =="
    python -m pytest tests/ -q -x
}

run_slow() {
    echo "== RUN_SLOW statistical lane (KSD SGLD-vs-LD ordering, ~4.5 min) =="
    RUN_SLOW=1 python -m pytest tests/test_ksd_sgld_vs_ld.py -q -x
}

run_tpu() {
    echo "== RUN_TPU hardware lane (real chip via the axon tunnel) =="
    # deliberately NOT under the CPU conftest: runs on the default (TPU)
    # backend; generous timeouts per CLAUDE.md (endpoint queue stalls)
    RUN_TPU=1 python -m pytest tests_tpu/ -q -x -p no:cacheprovider
}

case "$lane" in
    default) run_default ;;
    slow)    run_slow ;;
    tpu)     run_tpu ;;
    all)     run_default; run_slow; run_tpu ;;
    *) echo "unknown lane '$lane' (default|slow|tpu|all)"; exit 2 ;;
esac
