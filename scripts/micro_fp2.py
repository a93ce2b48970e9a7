"""Component breakdown of fingerprint_tokens cost at sf0.1."""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.operators.text import (  # noqa: E402
    BPE_PATTERN,
    bpe_token_count,
    normalized,
    rolling_fingerprint,
)

SF = "/root/testdata/sf0.1"
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(32).cache()
n = docs.count()
avg_len = docs.select(F.avg(F.length("text"))).collect()[0][0]
print(f"docs: {n} avg_len={avg_len:.0f}")


def timeit(name, col):
    ts = []
    for _ in range(3):
        t0 = time.time()
        docs.select(F.sum(col.cast("double"))).collect()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name:28s} median={ts[1]:.3f}s runs={[round(t,3) for t in ts]}")


timeit("baseline length(text)", F.length("text"))
timeit("norm only", F.length(normalized("text")))
timeit("bpe_token_count", bpe_token_count("text"))
timeit("rolling (let_once bound)", rolling_fingerprint("text"))
timeit("md5 fingerprint", F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long"))
# rolling over a PRE-CACHED norm column (materialization barrier)
docs_n = docs.select("doc_id", normalized("text").alias("ntext")).cache()
docs_n.count()


def timeit_n(name, col):
    ts = []
    for _ in range(3):
        t0 = time.time()
        docs_n.select(F.sum(col.cast("double"))).collect()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name:28s} median={ts[1]:.3f}s runs={[round(t,3) for t in ts]}")


from hhek2sqlite_spark.operators.text import ROLLING_BASE, ROLLING_MOD  # noqa: E402


def perchar_raw(c):
    chars = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(c.substr(i, F.lit(1))),
    )
    folded = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, cp: F.pmod(acc * F.lit(ROLLING_BASE) + cp, F.lit(ROLLING_MOD)),
    )
    return F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(folded)


timeit_n("rolling perchar on cached norm", perchar_raw(F.col("ntext")))
spark.stop()
