"""Lint every registered DuckDB oracle for latent dtype drift.

The round-3 driver caught two oracles whose ``SUM`` over BIGINT
widened to HUGEINT, which ``fetchdf()`` coerces to float64 while the
Spark side emits int64 — identical values, different value-hash
(``7991`` vs ``7991.0``).  This lint runs ONLY the DuckDB side of all
oracles at sf0.001 and flags any float64 result column whose non-null
values are all integral: almost always an uncast ``SUM``/``COUNT``
arithmetic that needs ``CAST(... AS BIGINT)``.

This is the fast HEURISTIC sweep; the authoritative gates are
``tools/gen_oracle_casts.py --check`` (diffs actual result dtypes
against the Spark side, kept current in tools/ci.sh) and the strict
dtype comparison in ``tests/oracle.py::compare``.  Expected residual
suspects: columns that carry NULLs — pandas stores a nullable int64
as float64 on BOTH engine sides, so they hash consistently and are
not bugs.  Exit code is therefore 0 on suspects (informational) and
1 only on oracle execution errors.

Usage: python tools/oracle_lint.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from streamforge_spark import registry  # noqa: E402
from tests.oracle import duck_con  # noqa: E402

# (query, column) pairs audited as legitimately-float on BOTH sides.
ALLOW: set[tuple[str, str]] = set()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all()
    con = duck_con(sf_dir)
    suspects, errors = [], []
    for name, sql in sorted(registry.ORACLES.items()):
        try:
            df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001 - report, keep linting
            errors.append((name, str(e).splitlines()[0]))
            continue
        for c in df.columns:
            if (name, c) in ALLOW or not pd.api.types.is_float_dtype(df[c]):
                continue
            v = df[c].dropna().to_numpy(dtype=float)
            if len(v) and np.all(v == np.floor(v)) and np.all(np.abs(v) < 2**53):
                suspects.append((name, c, v[:3].tolist()))
    for name, err in errors:
        print(f"ERROR  {name}: {err}")
    for name, c, sample in suspects:
        print(f"SUSPECT {name}.{c}: float64 but integral values {sample} "
              f"— NULL-bearing int column (benign) or uncast HUGEINT; "
              f"gen_oracle_casts --check is authoritative")
    print(f"oracle_lint: {len(registry.ORACLES)} oracles, "
          f"{len(suspects)} suspects, {len(errors)} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
