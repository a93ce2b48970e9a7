"""Command-line face of the engine — the reference is a CLI tool
(/root/reference/hhek2sqlite.go:1205-1209, flags ``-optin -optout
-readonly -backa``), so the conversion capability must be reachable
without writing Python:

    python -m hhek2sqlite_spark convert --optin hem.mdb --optout hem.db
    python -m hhek2sqlite_spark convert --optin hem.db  --optout back.mdb
    python -m hhek2sqlite_spark convert --optin hem.db  --optout out_dir
    python -m hhek2sqlite_spark convert --optin out_dir --optout hem.db --indexes

The first form IS the reference's actual program (MDB -> SQLite in one
command); the second is its ``-backa`` reverse, via the pure-Python Jet
2.0 writer (sources/jet2.py) instead of Windows/COM. The read side
dispatches on the .mdb header version (sources/mdb.py): Jet 2.0,
Jet 3 (Access 95/97) and Jet 4 (Access 2000-2003) are read natively;
ACE (2007+) is refused by name with the UCanAccess envelope pointer.

Differences from the reference, by design:

- Direction is inferred from the endpoints (``.mdb`` / ``.db``/
  ``.sqlite`` file vs parquet directory) instead of the ``-backa``
  flag; ``--backa`` is still accepted as a no-op for muscle-memory
  parity.
- ``--readonly`` is accepted for parity (S9) and is semantically
  automatic: Spark reads never mutate the source.
- ``--indexes`` creates the 15 reverse-direction secondary indexes (S5,
  /root/reference/hhek2sqlite.go:444 et al.) on a SQLite destination;
  like the reference, the forward direction defaults to none.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hhek2sqlite_spark",
        description="PySpark-native hhek engine: direction-reversible conversion",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser(
        "convert",
        help="convert between a Jet 2.0 .mdb file, a SQLite .db file and "
        "a parquet directory (direction inferred from the endpoints)",
    )
    c.add_argument("--optin", required=True, metavar="SRC",
                   help="source: .mdb/.db/.sqlite file or parquet directory")
    c.add_argument("--optout", required=True, metavar="DST",
                   help="destination: .mdb/.db/.sqlite file or parquet directory")
    c.add_argument("--indexes", action="store_true",
                   help="create the 15 secondary indexes on a SQLite destination (S5)")
    c.add_argument("--readonly", action="store_true",
                   help="parity no-op: Spark never mutates the source (S9)")
    c.add_argument("--backa", action="store_true",
                   help="parity no-op: direction is inferred from the endpoints")
    q = sub.add_parser(
        "query",
        help="run a registered analytic query against a test-data scale dir",
    )
    q.add_argument("name", nargs="?", metavar="NAME",
                   help="query name (omit with --list to enumerate)")
    q.add_argument("--list", action="store_true", dest="list_queries",
                   help="list every registered query name and exit")
    q.add_argument("--sf-dir", default=None,
                   help="parquet table directory (default $SPARK_GRAFT_SF_DIR "
                        "or /root/testdata/sf0.1)")
    q.add_argument("--limit", type=int, default=20,
                   help="max rows to print (default 20; 0 = count only)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "convert":
        from hhek2sqlite_spark.session import get_spark
        from hhek2sqlite_spark.sources.sqlite_io import convert

        spark = get_spark("hhek2sqlite_spark-cli")
        counts = convert(spark, args.optin, args.optout, create_indexes=args.indexes)
        for name, n in counts.items():
            print(f"{name}: {n} rows")
        print(f"converted {len(counts)} tables: {args.optin} -> {args.optout}")
        return 0
    if args.cmd == "query":
        from hhek2sqlite_spark.plans import QUERIES

        if args.list_queries:
            for name in sorted(QUERIES):
                print(name)
            return 0
        if not args.name:
            print("error: NAME required (or --list)", file=sys.stderr)
            return 2
        if args.name not in QUERIES:
            print(f"error: unknown query {args.name!r} (see --list)", file=sys.stderr)
            return 2
        from hhek2sqlite_spark.session import get_spark
        from hhek2sqlite_spark.sources.parquet import DEFAULT_SF_DIR

        sf_dir = args.sf_dir or DEFAULT_SF_DIR
        spark = get_spark("hhek2sqlite_spark-cli")
        df = QUERIES[args.name](spark, sf_dir)
        # ONE evaluation: count() + show() each trigger a full job, so a
        # heavy analytic query would run twice (round-5 advice). Collect
        # limit+1 rows when printing (enough to know if output was
        # truncated) and pay the full count only in count-only mode.
        if args.limit:
            rows = df.take(args.limit + 1)  # the single job
            shown = rows[: args.limit]
            # re-wrap the already-collected rows so show()'s formatting
            # runs driver-local instead of re-evaluating the query
            spark.createDataFrame(shown, df.schema).show(args.limit, truncate=False)
            more = " (truncated)" if len(rows) > args.limit else ""
            print(f"{args.name}: showing {len(shown)} rows{more} ({sf_dir})")
        else:
            print(f"{args.name}: {df.count()} rows ({sf_dir})")
        return 0
    return 2  # pragma: no cover - argparse enforces a subcommand


if __name__ == "__main__":
    sys.exit(main())
