"""Generate an sf1 data-plane bench dataset by 10x key-offset replication
of /root/testdata/sf0.1.

The driver ships sf{0.001,0.01,0.1}; SCALE.md's "survives 100x" claims need
at least one measured decade of DATA-plane scaling (the metadata plane is
covered by tools/scale_bench.py at 1M files). This builds a referentially
consistent sf1 (~6M lineitem rows) under /tmp:

- fact/key tables replicate 10x with per-replica key offsets (orderkey,
  partkey, suppkey, custkey, event_id, user_id, doc_id, vec_id), keeping
  join fan-outs identical to the source distribution;
- dimensions (nation, region) copy as-is;
- document TEXT is rewritten per replica with a vowel permutation
  (``translate``), so replicas share no shingles — dedup workloads scale by
  corpus size, not by 10 artificial near-dup copies of every document
  (which would quadratically inflate pair joins BY CONSTRUCTION and say
  nothing about the plans);
- timestamps, floats, labels, embeddings stay as-is.

Bench data only — correctness oracles always run on the driver's parquet.

Usage: python tools/make_sf1.py [out_root]   (default /tmp/dss_sf1)
Writes <out_root>/sf1/*.parquet and a _READY marker; cached by source
identity (size+mtime) like the workload fixtures.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# ten vowel permutations, identity first (replica 0 = the original text)
VOWELS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
          "aeiuo", "eiaou", "ioeua", "oueia", "uaoei"]


def _identity() -> str:
    parts = []
    for fn in sorted(os.listdir(SRC)):
        if fn.endswith(".parquet"):
            st = os.stat(os.path.join(SRC, fn))
            parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def build(out_root: str = "/tmp/dss_sf1") -> str:
    from pyspark.sql import functions as F

    from delta_sharing_spark import get_spark
    from delta_sharing_spark.io import read_table

    out = os.path.join(out_root, "sf1")
    marker = os.path.join(out, "_READY")
    key = _identity()
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == key:
                return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="dss_sf1_gen")
    # write INT64 µs timestamps (not legacy INT96) so the output reads
    # back exactly like the driver's normalized testdata
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")

    def load(name):
        return read_table(spark, SRC, name)

    def offsets(df, cols):
        """Union of REPLICAS copies with per-replica offsets on key cols;
        offset unit = next power of 10 above the key's max (keys stay
        readable and disjoint)."""
        units = {}
        for c in cols:
            mx = df.agg(F.max(c)).collect()[0][0] or 0
            unit = 1
            while unit <= mx:
                unit *= 10
            units[c] = unit
        rep = spark.range(REPLICAS).withColumnRenamed("id", "__r")
        wide = df.crossJoin(rep)
        for c, unit in units.items():
            wide = wide.withColumn(c, F.col(c) + F.col("__r") * unit)
        return wide, units

    def write(df, name):
        df.drop("__r").coalesce(8).write.mode("overwrite").parquet(
            os.path.join(out, f"_{name}"))
        # single-file layout like the source testdata
        import glob

        parts = glob.glob(os.path.join(out, f"_{name}", "*.parquet"))
        if len(parts) == 1:
            shutil.move(parts[0], os.path.join(out, f"{name}.parquet"))
            shutil.rmtree(os.path.join(out, f"_{name}"))
        else:
            # keep multi-file as a directory named <table>.parquet —
            # spark/duckdb both read it
            dest = os.path.join(out, f"{name}.parquet")
            shutil.rmtree(dest, ignore_errors=True)
            shutil.move(os.path.join(out, f"_{name}"), dest)

    # dimensions: copy verbatim
    for name in ("nation", "region"):
        shutil.copy(os.path.join(SRC, f"{name}.parquet"),
                    os.path.join(out, f"{name}.parquet"))

    # consistent key offsets across tables: compute units from the OWNING
    # table, reuse for the referencing ones
    cust, cust_units = offsets(load("customer"), ["c_custkey"])
    write(cust, "customer")
    part_df, part_units = offsets(load("part"), ["p_partkey"])
    write(part_df, "part")
    supp, supp_units = offsets(load("supplier"), ["s_suppkey"])
    write(supp, "supplier")
    orders, order_units = offsets(load("orders"), ["o_orderkey"])
    orders = orders.withColumn(
        "o_custkey",
        F.col("o_custkey") + F.col("__r") * cust_units["c_custkey"])
    write(orders, "orders")
    li, _ = offsets(load("lineitem"), [])
    li = (li.withColumn("l_orderkey", F.col("l_orderkey")
                        + F.col("__r") * order_units["o_orderkey"])
          .withColumn("l_partkey", F.col("l_partkey")
                      + F.col("__r") * part_units["p_partkey"])
          .withColumn("l_suppkey", F.col("l_suppkey")
                      + F.col("__r") * supp_units["s_suppkey"]))
    write(li, "lineitem")

    ev, _ = offsets(load("events"), ["event_id", "user_id"])
    write(ev, "events")

    docs, _ = offsets(load("documents"), ["doc_id"])
    src_v = "aeiouAEIOU"
    # one WHEN branch per replica; coalesce picks the matching branch
    # (concat would null out the whole map: every non-matching branch is
    # NULL and concat null-propagates)
    perm = F.coalesce(*[
        F.when(F.col("__r") == i,
               F.lit(VOWELS[i] + VOWELS[i].upper()))
        for i in range(REPLICAS)])
    docs = (docs.withColumn("__perm", perm)
            .withColumn("text",
                        F.expr(f"translate(text, '{src_v}', __perm)"))
            .drop("__perm")
            .withColumn("n_chars", F.length("text")))
    write(docs, "documents")

    emb, _ = offsets(load("embeddings"), ["vec_id"])
    write(emb, "embeddings")

    with open(marker, "w") as f:
        f.write(key)
    return out


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dss_sf1"
    print(build(root))
