#!/bin/bash
# Mode dispatch, mirroring the reference's entrypoint contract
# (ref scripts/entrypoint.sh: no-arg -> server, test, bash, one-shot run).
set -e
case "${1:-}" in
  "")
    exec kmer_guts_server -D /data -p "${PORT:-5000}"
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
