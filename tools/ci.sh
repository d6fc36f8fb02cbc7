#!/bin/sh
# Full verification pipeline — everything the driver/judge checks,
# runnable locally in one shot (~20 min on local[32]):
#   sh tools/ci.sh
set -e
cd "$(dirname "$0")/.."
echo "== driver artifacts committed (round-start guard) =="
if [ -n "$(git status --porcelain -- 'CORRECTNESS_r*.json' 'BENCH_r*.json')" ]; then
    echo "ci: CORRECTNESS/BENCH artifacts uncommitted — run sh tools/round_start.sh first" >&2
    exit 1
fi
echo "== unit + streaming + oracle parity (sf0.001) =="
python -m pytest tests/ -x -q
echo "== full oracle parity at driver scale (sf0.01) =="
STREAMFORGE_PARITY_SF=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q
echo "== every registered query has an oracle (no_oracle gate) =="
python -c "
from streamforge_spark import registry
registry.load_all()  # raises if any queries() name lacks oracle_sql()
assert set(registry.QUERIES) == set(registry.ORACLES), 'queries/oracles diverge'
print(f'{len(registry.QUERIES)} queries, all oracled')
"
echo "== oracle dtype-cast map current (HUGEINT drift lint) =="
python tools/gen_oracle_casts.py --check
echo "== source pins current (dirty-bit rotation state) =="
python tools/gen_source_pins.py --check
echo "== physical-plan audit (PLANS.md) =="
python tools/plan_report.py
echo "== measured shuffle volumes (SHUFFLE.md) =="
python tools/shuffle_audit.py
echo "== headline bench (sf0.1) =="
python bench.py
