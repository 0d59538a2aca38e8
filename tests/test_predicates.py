"""Predicate algebra tests — ports the intent of the reference's
JsonPredicateSuite / JsonPredicateEvaluatorV2Suite / ColumnRangeSuite truth
tables (server/src/test/scala/io/delta/standalone/internal/)."""

from __future__ import annotations

import pytest

from delta_sharing_spark.plans.predicates import (
    PredicateError,
    keep_file,
    parse_predicate,
    validate_tree,
)


def col(name, vtype="int"):
    return {"op": "column", "name": name, "valueType": vtype}


def lit(value, vtype="int"):
    return {"op": "literal", "value": str(value), "valueType": vtype}


def op(kind, *children):
    return {"op": kind, "children": list(children)}


class TestValidation:
    def test_unknown_op_rejected(self):
        with pytest.raises(PredicateError):
            validate_tree({"op": "bogus"})

    def test_bad_arity(self):
        with pytest.raises(PredicateError):
            validate_tree(op("not", col("a"), col("b")))
        with pytest.raises(PredicateError):
            validate_tree(op("equal", col("a")))
        with pytest.raises(PredicateError):
            validate_tree(op("and", col("a")))

    def test_bad_type(self):
        with pytest.raises(PredicateError):
            validate_tree({"op": "column", "name": "a", "valueType": "uuid"})

    def test_depth_limit(self):
        tree = col("a")
        for _ in range(101):
            tree = op("not", tree)
        with pytest.raises(PredicateError):
            parse_predicate(tree)

    def test_size_limit(self):
        big = '{"op": "isNull", "children": [{"op": "column", "name": "' \
              + "x" * (1024 * 1024) + '", "valueType": "int"}]}'
        with pytest.raises(PredicateError):
            parse_predicate(big)


class TestPartitionEval:
    """Exact evaluation on partition values (V1 semantics)."""

    def keep(self, tree, pv):
        return keep_file(tree, pv, {}, ["p"])

    def test_equal(self):
        t = op("equal", col("p", "string"), lit("a", "string"))
        assert self.keep(t, {"p": "a"})
        assert not self.keep(t, {"p": "b"})

    def test_comparisons(self):
        assert self.keep(op("lessThan", col("p"), lit(5)), {"p": "3"})
        assert not self.keep(op("lessThan", col("p"), lit(5)), {"p": "7"})
        assert self.keep(op("greaterThanOrEqual", col("p"), lit(5)), {"p": "5"})
        # literal-op-column is normalized by flipping
        assert self.keep(op("greaterThan", lit(5), col("p")), {"p": "3"})
        assert not self.keep(op("greaterThan", lit(5), col("p")), {"p": "7"})

    def test_null_partition_value_is_unknown(self):
        # empty string = null (PROTOCOL.md:3896-3906): comparison -> Unknown
        t = op("equal", col("p", "string"), lit("a", "string"))
        assert self.keep(t, {"p": ""})

    def test_is_null(self):
        t = op("isNull", col("p", "string"))
        assert self.keep(t, {"p": ""})
        assert not self.keep(t, {"p": "a"})

    def test_not(self):
        t = op("not", op("equal", col("p", "string"), lit("a", "string")))
        assert not self.keep(t, {"p": "a"})
        assert self.keep(t, {"p": "b"})

    def test_date_type(self):
        t = op("equal", col("p", "date"), lit("2021-04-28", "date"))
        assert self.keep(t, {"p": "2021-04-28"})
        assert not self.keep(t, {"p": "2021-04-29"})


class TestStatsEval:
    """Min/max range semantics with three-valued Unknown logic
    (ColumnRange.scala:70-174, JsonPredicateEvaluatorV2.scala:20-52)."""

    STATS = {"minValues": {"c": 10}, "maxValues": {"c": 20},
             "nullCount": {"c": 0}}

    def keep(self, tree, stats=None):
        return keep_file(tree, {}, self.STATS if stats is None else stats, [])

    def test_equal_in_range(self):
        assert self.keep(op("equal", col("c"), lit(15)))
        assert not self.keep(op("equal", col("c"), lit(25)))
        assert not self.keep(op("equal", col("c"), lit(5)))
        assert self.keep(op("equal", col("c"), lit(10)))  # boundary

    def test_less_greater(self):
        assert self.keep(op("lessThan", col("c"), lit(15)))      # min 10 < 15
        assert not self.keep(op("lessThan", col("c"), lit(10)))  # min !< 10
        assert self.keep(op("greaterThan", col("c"), lit(15)))   # max 20 > 15
        assert not self.keep(op("greaterThan", col("c"), lit(20)))

    def test_missing_stats_never_skips(self):
        assert self.keep(op("equal", col("c"), lit(999)), stats={})
        assert self.keep(op("lessThan", col("c"), lit(-1)), stats={})

    def test_unknown_and_false_is_false(self):
        # (missing-stats eq) AND (definitely-false eq on ranged col)
        t = op("and",
               op("equal", col("nostats"), lit(1)),
               op("equal", col("c"), lit(999)))
        assert not self.keep(t)

    def test_unknown_or_true_is_true(self):
        t = op("or",
               op("equal", col("nostats"), lit(1)),
               op("equal", col("c"), lit(15)))
        assert self.keep(t)

    def test_unknown_or_false_is_unknown(self):
        t = op("or",
               op("equal", col("nostats"), lit(1)),
               op("equal", col("c"), lit(999)))
        assert self.keep(t)  # Unknown keeps

    def test_not_over_range_not_negated(self):
        # NOT over a data-column range rewrite is an over-approximation;
        # it must stay Unknown (keep), never flip to a wrong skip
        t = op("not", op("equal", col("c"), lit(15)))
        assert self.keep(t)

    def test_is_null_via_nullcount(self):
        t = op("isNull", col("c"))
        assert not self.keep(t)  # nullCount 0 -> no nulls
        assert self.keep(t, stats={"nullCount": {"c": 3}})
        assert self.keep(t, stats={})  # unknown nullCount -> keep


class TestNotPoisoning:
    """NOT whose child mixes partition + data columns must be poisoned, not
    negated over a silently-weakened child (ref UnsupportedOpPruner.scala:30:
    any unsupported descendant drops the whole NotOp).

    Regression: not(and(p='x', d=1)) used to translate the child as just
    p='x' (the data conjunct dropped) and negate it, wrongly pruning every
    file with p='x' even though such files can hold rows with d != 1 that
    satisfy the NOT."""

    TREE = op("not", op("and",
                        op("equal", col("p", "string"), lit("x", "string")),
                        op("equal", col("d"), lit(1))))

    def test_sessionless_keeps(self):
        assert keep_file(self.TREE, {"p": "x"}, {}, ["p"])

    def test_column_path_keeps(self, spark):
        from delta_sharing_spark.plans.predicates import file_keep_condition

        manifest = spark.createDataFrame(
            [("f1", {"p": "x"}, "{}", "{}", "{}"),
             ("f2", {"p": "y"}, "{}", "{}", "{}")],
            "path string, partitionValues map<string,string>, "
            "minValues string, maxValues string, nullCount string")
        kept = manifest.filter(file_keep_condition(self.TREE, ["p"]))
        assert {r.path for r in kept.collect()} == {"f1", "f2"}

    def test_exact_partition_not_still_prunes(self, spark):
        # fully partition-supported NOT must still negate exactly
        from delta_sharing_spark.plans.predicates import file_keep_condition

        tree = op("not", op("equal", col("p", "string"), lit("x", "string")))
        manifest = spark.createDataFrame(
            [("f1", {"p": "x"}, "{}", "{}", "{}"),
             ("f2", {"p": "y"}, "{}", "{}", "{}")],
            "path string, partitionValues map<string,string>, "
            "minValues string, maxValues string, nullCount string")
        kept = manifest.filter(file_keep_condition(tree, ["p"]))
        assert {r.path for r in kept.collect()} == {"f2"}

    def test_isnull_over_weakened_child_keeps(self):
        t = op("isNull", op("and",
                            op("equal", col("p", "string"), lit("x", "string")),
                            op("equal", col("d"), lit(1))))
        assert keep_file(t, {"p": "x"}, {}, ["p"])
