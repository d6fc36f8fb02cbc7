#!/bin/sh
# Round-start guard (judge r9 item 1, recurring since r8): the driver
# writes CORRECTNESS_r{N}.json / BENCH_r{N}.json at round end, and the
# source pins must be regenerated FROM THE COMMIT holding those
# artifacts before any query edit — otherwise every name the driver
# just verified stays dirty and re-queues, burning the next round's
# 50-slot window.
#
# Run this FIRST, every round:
#   sh tools/round_start.sh
#
# It is idempotent:
#   1. refuses to proceed while a CORRECTNESS/BENCH artifact sits
#      uncommitted (commits them itself if the tree is otherwise
#      clean, since an artifact-only commit is always the right move);
#   2. regenerates source pins (no-op if already current);
#   3. asserts registry._driver_dirty() is empty — if not, a query was
#      edited before the guard ran and the round starts with known
#      re-queue debt; the guard says which names.
set -e
cd "$(dirname "$0")/.."

# 1. artifacts must be committed before pins can certify them
DIRTY_ART=$(git status --porcelain -- 'CORRECTNESS_r*.json' 'BENCH_r*.json')
if [ -n "$DIRTY_ART" ]; then
    OTHER=$(git status --porcelain | grep -v -E 'CORRECTNESS_r[0-9]*\.json|BENCH_r[0-9]*\.json' || true)
    if [ -n "$OTHER" ]; then
        echo "round_start: uncommitted CORRECTNESS/BENCH artifacts AND other changes:" >&2
        git status --porcelain >&2
        echo "round_start: commit the artifacts alone first, then re-run." >&2
        exit 1
    fi
    echo "round_start: committing driver artifacts:"
    echo "$DIRTY_ART"
    git add CORRECTNESS_r*.json BENCH_r*.json
    git commit -q -m "Commit driver round artifacts (round-start guard)"
fi

# 2. pins from the artifact commit's tree
python tools/gen_source_pins.py

if ! git diff --quiet -- streamforge_spark/queries/source_pins.py; then
    git add streamforge_spark/queries/source_pins.py
    git commit -q -m "Regenerate source pins from latest driver artifacts"
    echo "round_start: pins regenerated and committed."
else
    echo "round_start: pins already current."
fi

# 3. the round must start with zero dirty names
python - <<'EOF'
import sys
sys.path.insert(0, ".")
from streamforge_spark import registry
dirty = registry._driver_dirty()
if dirty:
    print("round_start: WARNING — %d names dirty at round start (edited "
          "after their green run?):" % len(dirty), file=sys.stderr)
    for n in sorted(dirty):
        print("  " + n, file=sys.stderr)
    sys.exit(1)
print("round_start: OK — 0 dirty names; safe to edit queries.")
EOF
