#!/bin/bash
# Mode dispatch, mirroring the reference's entrypoint contract
# (ref scripts/entrypoint.sh: no-arg -> server, test, bash, one-shot run).
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
  *)
    echo "Unknown mode: $1 (expected: <none>|test|bash|run|async)" >&2
    exit 2
    ;;
esac
