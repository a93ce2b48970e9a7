"""Run every queries()/oracle_sql() pair through the local parity gate
(the repr-strict emulation of the driver's hash compare) and print one
line per query. Usage: python scripts/run_parity.py [sf_dir] [names...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.testing.parity import run_parity  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark()
    n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            res = run_parity(spark, name, queries[name], oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        print(str(res))
        if not res.ok:
            n_fail += 1
    no_oracle = sorted(set(queries) - set(oracles))
    print(f"rows-only (no oracle): {no_oracle}")
    print(f"FAILURES: {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
