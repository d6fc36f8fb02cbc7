"""Lint every registered DuckDB oracle for latent dtype drift.

The round-3 driver caught two oracles whose ``SUM`` over BIGINT
widened to HUGEINT, which ``fetchdf()`` coerces to float64 while the
Spark side emits int64 — identical values, different value-hash
(``7991`` vs ``7991.0``).  This lint runs ONLY the DuckDB side of all
oracles at sf0.001 and flags any float64 result column whose non-null
values are all integral: almost always an uncast ``SUM``/``COUNT``
arithmetic that needs ``CAST(... AS BIGINT)``.

Columns named in ``ALLOW`` are known-legitimate float outputs whose
values happen to be integral at tiny SF (both engine sides emit
float64 for them, so the driver's hash matches anyway).  A flagged
column is only a REAL bug when the Spark side emits an integer dtype
— which ``tests/oracle.py::compare`` now fails hard on — so run the
parity suite for the definitive verdict; this lint is the fast sweep.

Usage: python tools/oracle_lint.py [sf_dir]
Exit code 1 if any non-allowed suspect is found.
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
              f"— uncast HUGEINT? verify with parity test")
    print(f"oracle_lint: {len(registry.ORACLES)} oracles, "
          f"{len(suspects)} suspects, {len(errors)} errors")
    return 1 if (suspects or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
