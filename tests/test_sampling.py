from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_sharing_spark.operators.sampling import (
    shuffle_shards,
    split_assign,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    from delta_sharing_spark.io import read_table

    return read_table(spark, "/root/testdata/sf0.001", "documents")


class TestSplitAssign:
    def test_partition_of_corpus(self, docs):
        out = split_assign(docs, "doc_id",
                           [("train", 0.8), ("val", 0.1), ("test", 0.1)])
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == docs.count()
        # roughly 80/10/10 (loose bound at sf0.001)
        total = sum(counts.values())
        assert counts["train"] / total > 0.7

    def test_assignment_stable_under_growth(self, docs):
        """A row's split must not change when the corpus grows — the
        defining property of hash splits vs random splits."""
        half = docs.filter("doc_id % 2 = 0")
        splits = [("train", 0.8), ("val", 0.2)]
        a = {r["doc_id"]: r["split"] for r in
             split_assign(half, "doc_id", splits)
             .select("doc_id", "split").collect()}
        b = {r["doc_id"]: r["split"] for r in
             split_assign(docs, "doc_id", splits)
             .select("doc_id", "split").collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_bad_fractions_rejected(self, docs):
        with pytest.raises(ValueError):
            split_assign(docs, "doc_id", [("a", 0.9), ("b", 0.4)])


class TestStratifiedSample:
    def test_deterministic_and_stratum_scoped(self, docs):
        kept = stratified_sample(docs, "lang", "doc_id",
                                 fractions={"en": 0.3},
                                 default_fraction=1.0)
        again = stratified_sample(docs, "lang", "doc_id",
                                  fractions={"en": 0.3},
                                  default_fraction=1.0)
        assert kept.count() == again.count()
        # non-en strata kept whole
        non_en = docs.filter("lang <> 'en'").count()
        assert kept.filter("lang <> 'en'").count() == non_en
        # en downsampled to roughly 30%
        en_all = docs.filter("lang = 'en'").count()
        en_kept = kept.filter("lang = 'en'").count()
        assert 0 < en_kept < en_all

    def test_zero_default_drops_unlisted(self, docs):
        kept = stratified_sample(docs, "lang", "doc_id",
                                 fractions={"en": 1.0})
        assert kept.filter("lang <> 'en'").count() == 0


class TestShuffleShards:
    def test_permutation_complete_and_dense(self, docs):
        out = shuffle_shards(docs, "doc_id", num_shards=8)
        assert out.count() == docs.count()
        # pos is dense 0..n-1 within every shard
        bad = (out.groupBy("shard")
               .agg(F.count("*").alias("n"), F.max("pos").alias("mx"),
                    F.countDistinct("pos").alias("d"))
               .filter("mx <> n - 1 OR d <> n"))
        assert bad.count() == 0

    def test_salt_changes_permutation(self, docs):
        a = shuffle_shards(docs, "doc_id", 8, salt="epoch1") \
            .select("doc_id", "shard", "pos")
        b = shuffle_shards(docs, "doc_id", 8, salt="epoch2") \
            .select("doc_id", "shard", "pos")
        moved = a.alias("a").join(b.alias("b"), "doc_id") \
            .filter("a.shard <> b.shard OR a.pos <> b.pos")
        assert moved.count() > 0

    def test_plan_has_single_exchange(self, docs):
        out = shuffle_shards(docs, "doc_id", num_shards=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestPackSequences:
    def test_budget_and_contiguity(self, docs, spark):
        from delta_sharing_spark.operators.sampling import pack_sequences

        d = docs.withColumn("n_tok", F.size(F.split("text", " ")))
        out = pack_sequences(d, "doc_id", "n_tok",
                             max_tokens=512, num_shards=4)
        assert out.count() == docs.count()
        # a doc STARTS inside its sequence's budget (offset < max_tokens)
        assert out.filter("offset >= 512").count() == 0
        # seq ids are dense per shard: max(seq_id)+1 == distinct seq count
        per = (out.groupBy("shard")
               .agg(F.max("seq_id").alias("mx"),
                    F.countDistinct("seq_id").alias("d"))
               .filter("d <> mx + 1"))
        assert per.count() == 0
        # contiguous fill: within a shard ordered by (seq_id, offset), each
        # doc starts exactly where the previous one's tokens ended
        from pyspark.sql import Window

        w = Window.partitionBy("shard").orderBy("seq_id", "offset")
        gaps = (out.withColumn(
                    "cum", F.col("seq_id") * 512 + F.col("offset"))
                .withColumn("prev_end",
                            F.lag(F.col("cum") + F.col("n_tok")).over(w))
                .filter("prev_end IS NOT NULL AND cum <> prev_end"))
        assert gaps.count() == 0

    def test_deterministic(self, docs):
        from delta_sharing_spark.operators.sampling import pack_sequences

        d = docs.withColumn("n_tok", F.size(F.split("text", " ")))
        a = pack_sequences(d, "doc_id", "n_tok", 512, 4) \
            .select("doc_id", "shard", "seq_id", "offset")
        b = pack_sequences(d, "doc_id", "n_tok", 512, 4) \
            .select("doc_id", "shard", "seq_id", "offset")
        assert a.exceptAll(b).count() == 0


class TestDecontaminate:
    def test_bench_members_flagged(self, docs, spark):
        from delta_sharing_spark.operators.dedup import decontaminate

        bench = docs.filter("doc_id % 17 = 0")
        hits = decontaminate(docs, bench, "doc_id", "text", shingle_k=13)
        flagged = {r["doc_id"] for r in hits.collect()}
        # every benchmark doc is trivially contaminated (it IS in train)
        bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
        assert bench_ids <= flagged

    def test_clean_corpus_not_flagged(self, docs, spark):
        from delta_sharing_spark.operators.dedup import decontaminate

        bench = docs.filter("doc_id % 17 = 0")
        train = docs.filter("doc_id % 17 <> 0")
        hits = decontaminate(train, bench, "doc_id", "text",
                             shingle_k=13, min_overlap=3)
        # distinct synthetic docs share few 13-grams: requiring 3 distinct
        # overlaps keeps the clean corpus (mostly) unflagged
        assert hits.count() < train.count() * 0.05


class TestBalanceStrata:
    def test_balances_to_smallest_stratum(self, docs):
        from delta_sharing_spark.operators.sampling import balance_strata

        orig = {r["lang"]: r["n"] for r in
                docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        n_min = min(orig.values())
        out = balance_strata(docs, "lang", "doc_id")
        kept = {r["lang"]: r["n"] for r in
                out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert set(kept) <= set(orig)
        for lang, n in kept.items():
            # binomial jitter around n_min, never above the stratum size
            assert n <= orig[lang]
            assert abs(n - n_min) <= max(12, n_min // 2)

    def test_deterministic_and_no_driver_rows(self, docs):
        from delta_sharing_spark.operators.sampling import balance_strata

        a = sorted(r["doc_id"] for r in
                   balance_strata(docs, "lang", "doc_id").collect())
        b = sorted(r["doc_id"] for r in
                   balance_strata(docs, "lang", "doc_id").collect())
        assert a == b and len(a) > 0
        # the corpus-side plan is a broadcast join + filter: no sort, no
        # window, no exchange of the full corpus
        plan = balance_strata(docs, "lang", "doc_id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestBuildMixture:
    def _docs(self, spark, n=200):
        rows = [(i, ["en", "zh", "es"][i % 3], (i * 7) % 40 + 5)
                for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, lang string, n_tok int")

    def _brute_force(self, df, weights, total, salt="mixture"):
        """Single global window cumsum — the spec the two-phase must match."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        h = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        budgets = [(s, int(float(w) * total)) for s, w in weights.items()]
        bdf = df.sparkSession.createDataFrame(budgets, ["lang", "budget"])
        w = Window.partitionBy("lang").orderBy("__h", "doc_id")
        return (
            df.join(bdf, "lang")
            .withColumn("__h", h)
            .withColumn(
                "__before",
                F.coalesce(
                    F.sum("n_tok").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)),
            )
            .filter(F.col("__before") < F.col("budget"))
        )

    def test_matches_brute_force_single_window(self, spark):
        from delta_sharing_spark.operators.sampling import build_mixture

        docs = self._docs(spark)
        weights = {"en": 0.5, "zh": 0.3, "es": 0.2}
        got = build_mixture(docs, "lang", "n_tok", "doc_id", weights, 1000)
        want = self._brute_force(docs, weights, 1000)
        assert {r["doc_id"] for r in got.collect()} == \
               {r["doc_id"] for r in want.collect()}

    def test_budget_semantics(self, spark):
        """First doc crossing the budget is included; per-stratum token sum
        lands in [budget, budget + max_doc_tokens)."""
        from pyspark.sql import functions as F

        from delta_sharing_spark.operators.sampling import build_mixture

        docs = self._docs(spark, n=300)
        weights = {"en": 0.6, "zh": 0.4}
        mix = build_mixture(docs, "lang", "n_tok", "doc_id", weights, 2000)
        sums = {r["lang"]: r["s"] for r in
                mix.groupBy("lang").agg(F.sum("n_tok").alias("s")).collect()}
        assert set(sums) == {"en", "zh"}  # 'es' absent from weights -> dropped
        for lang, budget in (("en", 1200), ("zh", 800)):
            assert budget <= sums[lang] < budget + 45  # max n_tok is 44

    def test_tiny_budget_still_takes_one_doc(self, spark):
        from delta_sharing_spark.operators.sampling import build_mixture

        docs = self._docs(spark, n=30)
        mix = build_mixture(docs, "lang", "n_tok", "doc_id", {"en": 1.0}, 1)
        assert mix.count() == 1

    def test_no_unpartitioned_window(self, spark):
        """The scale guarantee: every WindowExec partitions by stratum (+
        bucket) — no single-task global sort of a stratum's rows appears
        for the full-keep path (only the boundary bucket sorts)."""
        from delta_sharing_spark.operators.sampling import build_mixture

        docs = self._docs(spark)
        plan = build_mixture(docs, "lang", "n_tok", "doc_id",
                             {"en": 0.5, "zh": 0.5}, 1000) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "partitionspec=[]" not in plan.lower().replace(" ", "")


class TestQuantileBuckets:
    def _scored(self, spark, seed=7, n=400, strata=("en", "zh", "fr")):
        import random

        rng = random.Random(seed)
        rows = [(i, strata[i % len(strata)], rng.randrange(0, 1_000_000))
                for i in range(n)]
        return spark.createDataFrame(
            rows, "doc_id long, lang string, ppl_u long")

    def test_matches_naive_window_rank(self, spark):
        """The two-phase coarse-range plan computes exactly the textbook
        per-stratum ROW_NUMBER tertile split, including ties and strata
        whose size is not divisible by the bucket count."""
        from pyspark.sql import Window
        from delta_sharing_spark.operators.sampling import quantile_buckets

        df = self._scored(spark, n=401)  # 134/134/133 per stratum
        # force ties
        df = df.withColumn("ppl_u", (F.col("ppl_u") / 1000).cast("long"))
        got = {r.doc_id: r.bucket
               for r in quantile_buckets(df, "lang", "ppl_u",
                                         "doc_id").collect()}
        w = Window.partitionBy("lang").orderBy("ppl_u", "doc_id")
        naive = df.withColumn("r", F.row_number().over(w) - 1) \
            .withColumn("n", F.count(F.lit(1)).over(
                Window.partitionBy("lang")))
        for row in naive.collect():
            b1, b2 = row.n // 3, (2 * row.n) // 3
            want = ("head" if row.r < b1
                    else "middle" if row.r < b2 else "tail")
            assert got[row.doc_id] == want, row

    def test_custom_labels_and_skewed_scores(self, spark):
        from delta_sharing_spark.operators.sampling import quantile_buckets

        # all scores in one coarse range (constant) -> everything is a
        # boundary bucket; ranks still exact via the scoped window
        df = self._scored(spark, n=60).withColumn("ppl_u", F.lit(5))
        out = quantile_buckets(df, "lang", "ppl_u", "doc_id",
                               labels=("a", "b"))
        counts = {(r.lang, r.bucket): r["count"]
                  for r in out.groupBy("lang", "bucket").count().collect()}
        for lang in ("en", "zh", "fr"):
            assert counts[(lang, "a")] == 10
            assert counts[(lang, "b")] == 10

    def test_no_stratum_wide_window(self, spark):
        """Scale contract: every WindowExec in the plan partitions by
        (stratum, coarse range) — no per-stratum global sort."""
        from delta_sharing_spark.operators.sampling import quantile_buckets

        df = self._scored(spark)
        plan = quantile_buckets(df, "lang", "ppl_u", "doc_id") \
            ._jdf.queryExecution().executedPlan().toString()
        import re
        for spec in re.findall(r"partitionspec=\[([^\]]*)\]",
                               plan.lower().replace(" ", "")):
            assert spec != "", "unpartitioned window in plan"


class TestQuantileBucketsRandomized:
    def test_multi_seed_equivalence_with_naive_ranks(self, spark):
        """Randomized sweep (one Spark session, many corpora): heavy ties,
        skew, strata smaller than the label count, and singletons all
        match the textbook per-stratum ROW_NUMBER split exactly."""
        import random

        from pyspark.sql import Window
        from delta_sharing_spark.operators.sampling import quantile_buckets

        for seed in (1, 2, 3, 4, 5):
            rng = random.Random(seed)
            strata = ["en", "zh", "fr", "tiny"][: rng.randint(1, 4)]
            rows = []
            i = 0
            for s_name in strata:
                n = rng.choice([1, 2, 3, 7, 40, 81])
                for _ in range(n):
                    # small score domain -> massive ties
                    rows.append((i, s_name, rng.randrange(0, 6)))
                    i += 1
            df = spark.createDataFrame(
                rows, "doc_id long, lang string, s long")
            got = {r.doc_id: r.bucket
                   for r in quantile_buckets(df, "lang", "s",
                                             "doc_id").collect()}
            w = Window.partitionBy("lang").orderBy("s", "doc_id")
            naive = df.withColumn("r", F.row_number().over(w) - 1) \
                .withColumn("n", F.count(F.lit(1)).over(
                    Window.partitionBy("lang")))
            for row in naive.collect():
                b1, b2 = row.n // 3, (2 * row.n) // 3
                want = ("head" if row.r < b1
                        else "middle" if row.r < b2 else "tail")
                assert got[row.doc_id] == want, (seed, row)
