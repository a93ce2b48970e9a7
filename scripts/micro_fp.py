"""Microbenchmark: rolling-fingerprint + dot-product variants, isolated
from bench.py run-order noise. Times are per-variant medians over reps
in ONE warmed session."""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.operators.text import (  # noqa: E402
    ROLLING_BASE,
    ROLLING_MOD,
    _B4,
    _POW,
    normalized,
    rolling_fingerprint,
)
from hhek2sqlite_spark.operators import similarity  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(32).cache()
print("docs:", docs.count())


def perchar_substr(text):
    """round-1 form: per-char fold, substr per char (O(len^2) scans)."""
    norm = normalized(text)
    chars = F.transform(
        F.sequence(F.lit(1), F.length(norm)),
        lambda i: F.ascii(norm.substr(i, F.lit(1))),
    )
    folded = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, cp: F.pmod(acc * F.lit(ROLLING_BASE) + cp, F.lit(ROLLING_MOD)),
    )
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(folded)


def chunked_array(text):
    """split-once to char array (O(len)), then 8-char-chunked fold with
    O(1) element_at."""
    norm = normalized(text)
    cps = F.transform(F.split(norm, ""), lambda c: F.ascii(c).cast("long"))
    ln = F.size(cps)
    n8 = F.floor(ln / 8).cast("int")
    M = F.lit(ROLLING_MOD)

    def chunk_val(i):
        base = i * 8
        v = None
        for k in range(8):
            term = F.element_at(cps, base + F.lit(k + 1)) * F.lit(_POW[7 - k])
            v = term if v is None else v + term
        return v

    head = F.when(n8 == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), n8 - 1),
            F.lit(0).cast("long"),
            lambda acc, i: F.pmod(
                F.pmod(F.pmod(acc * F.lit(_B4), M) * F.lit(_B4), M) + chunk_val(i), M
            ),
        )
    )
    tail = F.aggregate(
        F.slice(cps, n8 * F.lit(8) + F.lit(1), F.lit(8)),
        head,
        lambda acc, cp: F.pmod(acc * F.lit(ROLLING_BASE) + cp, M),
    )
    return F.when(ln == 0, F.lit(0).cast("long")).otherwise(tail).cast("long")


def timeit(name, col):
    ts = []
    for _ in range(3):
        t0 = time.time()
        docs.select(F.sum(col.cast("double")).alias("s")).collect()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name:24s} median={ts[1]:.3f}s  runs={[round(t,3) for t in ts]}")
    return docs.select(F.sum(col.cast("double")).alias("s")).collect()[0].s


a = timeit("perchar_substr (r1)", perchar_substr("text"))
b = timeit("chunked_substr (HEAD)", rolling_fingerprint("text"))
c = timeit("chunked_array (new)", chunked_array("text"))
print("checksums equal:", a == b == c, a, b, c)

# --- similarity_topk: fold vs unrolled dot, prenorm both ---
emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
print("embeddings:", emb.count())


def run_topk(dim):
    t0 = time.time()
    n = similarity.brute_force_topk(emb, n_queries=10, k=5, dim=dim).count()
    return time.time() - t0, n


for name, d in [("topk fold(dim=None)", None), ("topk unrolled(dim=64)", 64)]:
    ts = []
    for _ in range(3):
        t, n = run_topk(d)
        ts.append(t)
    ts.sort()
    print(f"{name:24s} median={ts[1]:.3f}s rows={n} runs={[round(t,3) for t in ts]}")

spark.stop()
