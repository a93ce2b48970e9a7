"""Round-13 fix tests (ADVICE r12 items + carried VERDICT asks)."""

from __future__ import annotations

import pandas as pd
import pytest

from hhek2sqlite_spark.streaming.funnel import _ts_to_us


class TestTsToUs:
    """ADVICE r12: the old "'[ns]' in str(dtype)" test missed tz-aware
    timestamps ('datetime64[ns, UTC]' has no '[ns]' substring) and
    pandas-2 non-ns units, silently mis-scaling every stage time."""

    def test_naive_ns(self):
        s = pd.Series(pd.to_datetime(["2024-01-01 00:00:01"]))
        assert _ts_to_us(s).tolist() == [1_704_067_201_000_000]

    def test_tz_aware_utc(self):
        s = pd.Series(pd.to_datetime(["2024-01-01 00:00:01"], utc=True))
        assert str(s.dtype) == "datetime64[ns, UTC]"
        assert _ts_to_us(s).tolist() == [1_704_067_201_000_000]

    def test_tz_aware_non_utc_same_instant(self):
        s = pd.Series(
            pd.to_datetime(["2024-01-01 01:00:01"], utc=True)
        ).dt.tz_convert("Europe/Stockholm")
        assert _ts_to_us(s).tolist() == [1_704_070_801_000_000]

    def test_us_unit(self):
        s = pd.Series(
            pd.to_datetime(["2024-01-01 00:00:01"])
        ).astype("datetime64[us]")
        assert _ts_to_us(s).tolist() == [1_704_067_201_000_000]

    def test_refuses_raw_ints(self):
        with pytest.raises(TypeError, match="datetime64"):
            _ts_to_us(pd.Series([1, 2, 3], dtype="int64"))


class TestWriteTableSupersetColumns:
    """ADVICE r12: an HHEK-named table carrying EXTRA columns (possible
    from a self-describing Jet 3/4 source) used registry DDL and
    silently dropped the extras; it must now write every column."""

    def test_superset_keeps_extra_columns(self, spark, tmp_path):
        import sqlite3

        from hhek2sqlite_spark.sources.sqlite_io import write_table

        df = spark.createDataFrame(
            [(1, "A", 1999, "Man", "x")],
            "`Löpnr` int, `Namn` string, `Född` int, `Kön` string, "
            "`Extra` string",
        )
        db = str(tmp_path / "sup.db")
        assert write_table(df, db, "Personer") == 1
        con = sqlite3.connect(db)
        try:
            cols = [r[1] for r in con.execute('PRAGMA table_info("Personer")')]
            assert "Extra" in cols
            row = con.execute(
                'SELECT "Löpnr", "Extra" FROM "Personer"'
            ).fetchone()
            assert row == (1, "x")
        finally:
            con.close()

    def test_exact_registry_set_still_uses_registry_ddl(self, spark, tmp_path):
        import sqlite3

        from hhek2sqlite_spark.sources.sqlite_io import write_table

        df = spark.createDataFrame(
            [(1, "A", 1999, "Man")],
            "`Löpnr` int, `Namn` string, `Född` int, `Kön` string",
        )
        db = str(tmp_path / "exact.db")
        assert write_table(df, db, "Personer") == 1
        con = sqlite3.connect(db)
        try:
            ddl = con.execute(
                "SELECT sql FROM sqlite_master WHERE name='Personer'"
            ).fetchone()[0]
        finally:
            con.close()
        # registry DDL declares the PK; generic DDL does not
        assert "PRIMARY KEY" in ddl.upper() or "Löpnr" in ddl


class TestLatePriorityBroadcastGate:
    """ADVICE r12: the Q4 plan's broadcast hint must be gated on the
    slice's measured size — an unconditional hint bypasses
    autoBroadcastJoinThreshold/AQE and OOMs at large SF."""

    def test_hint_omitted_when_threshold_disabled(self, spark):
        from hhek2sqlite_spark.plans import extensions as ext

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = ext.q_late_priority_orders(spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            assert "BroadcastHashJoin" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_hint_applied_when_slice_fits(self, spark):
        from hhek2sqlite_spark.plans import extensions as ext

        df = ext.q_late_priority_orders(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastHashJoin" in plan

    def test_conf_bytes_parses_units(self):
        from hhek2sqlite_spark.plans.extensions import _conf_bytes

        assert _conf_bytes("10MB") == 10 * 1024 * 1024
        assert _conf_bytes("10485760b") == 10 * 1024 * 1024
        assert _conf_bytes("-1") == -1
        assert _conf_bytes("512k") == 512 * 1024


class TestOrderValueNtileReplan:
    """VERDICT r12 weak-set item: NTILE must not window-partition on
    the 5-value priority key (sort parallelism capped at 5). The
    re-plan derives the global rank from range partitions + broadcast
    prefix offsets and buckets arithmetically."""

    def _run(self, spark, rows):
        import hhek2sqlite_spark.plans.extensions as ext

        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
        )
        orig = ext.load_table
        try:
            ext.load_table = lambda _s, _d, n: orders
            out = ext.q_order_value_ntile(spark, "unused").collect()
        finally:
            ext.load_table = orig
        return {
            (r["priority"], r["quartile"]): (
                r["n_orders"], r["min_c"], r["max_c"]
            )
            for r in out
        }

    def test_hand_computed_remainder_rule(self, spark):
        rows = [(k, "A", float(k)) for k in range(1, 8)]  # cents 100..700
        rows += [(8, "B", 10.0), (9, "B", 9.0)]
        got = self._run(spark, rows)
        assert got == {
            # 7 rows, 4 buckets: q=1 rem=3 -> sizes 2,2,2,1
            ("A", 1): (2, 100, 200),
            ("A", 2): (2, 300, 400),
            ("A", 3): (2, 500, 600),
            ("A", 4): (1, 700, 700),
            # 2 rows, 4 buckets: q=0 -> one row per bucket, buckets 1,2
            ("B", 1): (1, 900, 900),
            ("B", 2): (1, 1000, 1000),
        }

    def test_window_partitioned_by_pid_not_priority(self, spark):
        import hhek2sqlite_spark.plans.extensions as ext
        from hhek2sqlite_spark.operators.util import release_local_checkpoints

        df = ext.q_order_value_ntile(spark, "/root/testdata/sf0.001")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "windowspecdefinition(pid" in plan, plan
        assert "windowspecdefinition(priority" not in plan, plan
        assert "ntile" not in plan.lower(), plan
        release_local_checkpoints(df)
