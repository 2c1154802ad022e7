#!/usr/bin/env bash
# Run the FULL test suite — fast profile plus every @slow golden
# (train-parity, beam, composition e2e, soak) — and record the artifact.
#
# The default `pytest -q` profile deselects 40+ slow goldens for a <6-min
# edit loop; this script is the "run them all" entry so the heavy
# correctness goldens execute at least once per round without anyone
# remembering `-m ''` (round-4 VERDICT weak #6).  The driver/CI artifact
# lands in FULLSUITE.txt at the repo root.
set -uo pipefail
cd "$(dirname "$0")/.."
: "${PYTEST_ARGS:=}"
echo "full suite started: $(date -u +%FT%TZ)" | tee FULLSUITE.txt
python -m pytest tests/ -q -m '' ${PYTEST_ARGS} 2>&1 | tail -40 | tee -a FULLSUITE.txt
rc=${PIPESTATUS[0]}
echo "full suite finished: $(date -u +%FT%TZ) rc=${rc}" | tee -a FULLSUITE.txt
exit "${rc}"
