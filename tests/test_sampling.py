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
