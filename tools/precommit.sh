#!/usr/bin/env bash
# Precommit guard: a commit must never land unless the tree compiles
# (main AND test sources). Rounds 2 and 5 both ended with a snapshot
# commit that failed to *compile*, zeroing the driver's correctness and
# bench signal for the whole round — this hook makes that impossible.
#
# Full-suite mode: PRECOMMIT_FULL=1 git commit ...  (runs sbt test too;
# use for milestone/end-of-round commits).
#
# Installed as .git/hooks/pre-commit (symlink).
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
if [[ "${PRECOMMIT_FULL:-0}" == "1" ]]; then
  echo "[precommit] sbt test (compile + full suite)..."
  sbt -batch test 2>&1 | tail -4 || { echo "[precommit] FAILED — commit blocked"; exit 1; }
else
  echo "[precommit] sbt compile Test/compile..."
  sbt -batch compile Test/compile 2>&1 | tail -3 || { echo "[precommit] FAILED — commit blocked"; exit 1; }
fi
echo "[precommit] OK"
