#!/usr/bin/env bash
# Tiered test entry (reference CI: test-fast per push, test-full on
# master, experimental nightly).  Usage: ./ci.sh {fast|full|slow}
set -euo pipefail
tier="${1:-fast}"

case "$tier" in
  fast)
    # unit tests + the cheapest example smoke (~5 min)
    python -m pytest tests/ -q -x \
      --deselect tests/test_parallel.py
    python -m pytest examples/ising examples/jq/ctmrg_jq.py -q -x
    ;;
  full)
    # everything except --runslow (~25 min on one core)
    python -m pytest tests/ examples/ -q
    ;;
  slow)
    # golden-parity + capability proofs (D=8 chi=160 abelian, POWER
    # parity); budget ~1 h on one core
    python -m pytest tests/ examples/ -q --runslow
    ;;
  *)
    echo "usage: $0 {fast|full|slow}" >&2
    exit 1
    ;;
esac
