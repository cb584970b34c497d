#!/bin/bash
# Mode dispatch, mirroring the reference's entrypoint contract
# (ref scripts/entrypoint.sh: no-arg -> server, test, async, init, bash,
# report; plus a one-shot CLI "run" mode).
set -e
case "${1:-}" in
  "")
    # optional deploy-config rendering (ref scripts/prepare_deploy_cfg.py)
    if [ -n "${KMER_DEPLOY_TEMPLATE:-}" ]; then
      python scripts/prepare_deploy_cfg.py "$KMER_DEPLOY_TEMPLATE" deploy.cfg
    fi
    exec kmer_guts_server -D "${DATA_DIR:-/data}" -p "${PORT:-5000}" \
      ${KMER_SERVICE_TOKEN:+--token "$KMER_SERVICE_TOKEN"} \
      ${ACCESS_LOG:+--access-log "$ACCESS_LOG"} \
      ${MAX_WORKERS:+--max-workers "$MAX_WORKERS"}
    ;;
  test)
    exec python -m pytest tests/ -x -q
    ;;
  bash)
    shift; exec /bin/bash "$@"
    ;;
  run)
    shift; exec kmer_guts -D /data "$@"
    ;;
  async)
    shift; exec python -m kmergutsjava_tpu.service.async_job "$@" -D /data
    ;;
  init)
    # reference "init" is a no-op echo; here it validates the mounted data
    # directory (header, slot invariants, function index) so a bad mount
    # fails at deploy time instead of on the first request
    d="${DATA_DIR:-/data}"
    if [ -d "$d" ]; then
      exec python -m kmergutsjava_tpu.tools check-table "$d"
    fi
    echo "init: no data directory at $d; nothing to validate"
    ;;
  report)
    # reference "report" reruns codegen with KB_SDK_COMPILE_REPORT_FILE
    # set; this module has no codegen, so the report is emitted directly
    exec python -m kmergutsjava_tpu.service.compile_report \
      "${KMER_COMPILE_REPORT_FILE:-./work/compile_report.json}"
    ;;
  *)
    echo "Unknown mode: $1 (expected: <none>|test|bash|run|async|init|report)" >&2
    exit 2
    ;;
esac
