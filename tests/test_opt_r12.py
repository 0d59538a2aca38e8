"""Optimization-round-12 regression tests: pin the single-evaluation plan
shapes and value equivalence of the operator internals changed this round
(tokenization lambda-binding, dup-gram window aggregates, self-join input
materialization)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta iota kappa lam mu"),
        (3, "nu xi omicron pi rho sigma tau upsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


class TestSingleEvaluation:
    def test_simhash_pairs_read_materialized_index(self, spark, docs):
        """simhash_near_pairs must consume the checkpointed bucket index on
        BOTH join sides — the fingerprint pipeline (token explode + md5 +
        64-sum aggregate) must not appear in the pair plan at all (it used
        to run once per side: two Generate+HashAggregate chains)."""
        from delta_sharing_spark.operators.dedup import (
            simhash_fingerprints,
            simhash_near_pairs,
        )

        fps = simhash_fingerprints(docs, "doc_id", "text")
        pairs = simhash_near_pairs(fps, "doc_id", max_hamming=8)
        plan = _plan(pairs)
        assert "ExistingRDD" in plan  # both sides scan the checkpoint
        assert "Scan parquet" not in plan
        # the fingerprint expressions live BEFORE the checkpoint only
        assert "md5" not in plan and "conv(" not in plan
        # and the values still hold: 0-1 identical, 2 near, 3 far
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 1) in got
        assert not any(3 in p for p in got)

    def test_blocked_near_dup_reads_packed_blocks_once(self, spark):
        """near_dup_pairs_blocked must consume the checkpointed packed
        blocks on both sides of the replicating join — the collect_list +
        pack pipeline must not appear in the pair plan (it used to run
        once per side)."""
        from delta_sharing_spark.operators.similarity import (
            near_dup_pairs,
            near_dup_pairs_blocked,
        )

        rows = [(i, [float(i % 3), 1.0, float((i * 7) % 5)])
                for i in range(40)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        pairs = near_dup_pairs_blocked(df, threshold=0.95, block_size=16)
        plan = _plan(pairs)
        assert "ExistingRDD" in plan
        assert "ObjectHashAggregate" not in plan  # collect_list pre-ckpt
        assert "collect_list" not in plan
        # value parity with the exact all-pairs path (cos rounded to 9dp
        # by the blocked path; compare pair sets)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        want = {(r["id_a"], r["id_b"])
                for r in near_dup_pairs(df, threshold=0.95).collect()}
        assert got == want


class TestDupGramWindowPath:
    def test_min_docs_2_matches_reference(self, spark):
        """The min_docs=2 window formulation of _dup_gram_islands must
        yield exactly the brute-force duplicated-gram islands."""
        from delta_sharing_spark.operators.dedup import duplicate_spans

        k = 4
        texts = {
            0: "abcdefgh_unique_tail_0",
            1: "zzzabcdefghzzz_tail_1",   # shares 'abcdefgh' grams with 0
            2: "nothing_in_common_here",
        }
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id long, text string")
        got = {r["doc_id"]: (r["n_dup_spans"], r["dup_chars"])
               for r in duplicate_spans(df, "doc_id", "text", k=k,
                                        min_docs=2, stride=1).collect()}

        # brute force: positions whose k-gram occurs in >=2 distinct docs,
        # merged into islands of span [pos, pos+k); accounting per doc
        grams: dict[str, set[int]] = {}
        for d, t in texts.items():
            for i in range(len(t) - k + 1):
                grams.setdefault(t[i:i + k], set()).add(d)
        want = {}
        for d, t in texts.items():
            hits = sorted(i for i in range(len(t) - k + 1)
                          if len(grams.get(t[i:i + k], set())) >= 2)
            islands, island = [], None
            for i in hits:
                if island and i <= island[1]:
                    island = (island[0], i + k)
                else:
                    if island:
                        islands.append(island)
                    island = (i, i + k)
            if island:
                islands.append(island)
            if islands:
                want[d] = (len(islands),
                           sum(e - s for s, e in islands))
        assert got == want


class TestTokenizationLambdaBinding:
    def test_word_ngrams_values(self, spark):
        """_word_ngrams (split bound once as a lambda variable) must equal
        the straightforward Python n-gram expansion, including the
        shorter-than-n full-text fallback."""
        from delta_sharing_spark.operators.scoring import _word_ngrams

        rows = [(0, "a b c d"), (1, "a"), (2, "x y"), (3, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["g"] for r in df.select(
            "doc_id", _word_ngrams("text", 2).alias("g")).collect()}
        assert out[0] == ["a b", "b c", "c d"]
        assert out[1] == ["a"]
        assert out[2] == ["x y"]
        assert out[3] == [""]

    def test_word_shingles_values(self, spark):
        from delta_sharing_spark.operators.dedup import _word_shingles

        rows = [(0, "a b c d"), (1, "a b"), (2, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["s"] for r in df.select(
            "doc_id", _word_shingles("text", 3).alias("s")).collect()}
        assert out[0] == ["a b c", "b c d"]
        assert out[1] == ["a b"]   # shorter than k -> whole text once
        assert out[2] == [""]


class TestFlacDecoderInternals:
    """Pin the rewritten FLAC decode internals (byte-chunk bit reader,
    table-driven CRCs, unrolled FIXED predictors) against straightforward
    per-bit / per-coefficient references — the rewrite must be value-
    identical bit for bit, including the exhaustion error."""

    def test_bitreader_equivalence_randomized(self):
        import random

        from delta_sharing_spark.operators.flac import FlacError, _BitReader

        class Ref:
            """The pre-rewrite per-bit reader semantics."""

            def __init__(self, data):
                self.data, self.pos, self.bit = data, 0, 0

            def read(self, nbits):
                v = 0
                for _ in range(nbits):
                    if self.pos >= len(self.data):
                        raise FlacError("bitstream exhausted")
                    v = (v << 1) | ((self.data[self.pos]
                                     >> (7 - self.bit)) & 1)
                    self.bit += 1
                    if self.bit == 8:
                        self.bit = 0
                        self.pos += 1
                return v

            def read_unary(self):
                q = 0
                while self.read(1) == 0:
                    q += 1
                return q

            def align(self):
                if self.bit:
                    self.bit = 0
                    self.pos += 1

        def run(reader, op, n):
            try:
                if op == 0:
                    return ("v", reader.read(n))
                if op == 1:
                    return ("v", reader.read_unary())
                return ("v", reader.align())
            except FlacError:
                return ("raise", None)

        rng = random.Random(7)
        for trial in range(300):
            data = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 40)))
            new, ref = _BitReader(data), Ref(data)
            for _ in range(rng.randrange(1, 30)):
                op = rng.randrange(3)
                n = rng.randrange(0, 37)
                want = run(ref, op, n)
                got = run(new, op, n)
                assert got == want, (data.hex(), op, n)
                if got[0] == "raise":
                    # decode aborts on FlacError; post-raise reader state
                    # is unobservable and intentionally unspecified
                    break
                assert (new.pos, new.bit) == (ref.pos, ref.bit)

    def test_bitreader_exhaustion_parity(self):
        import pytest as _pytest

        from delta_sharing_spark.operators.flac import FlacError, _BitReader

        # a read is legal iff its last bit exists
        br = _BitReader(b"\xab")
        assert br.read(8) == 0xAB
        assert br.read(0) == 0
        with _pytest.raises(FlacError, match="exhausted"):
            br.read(1)
        br = _BitReader(b"\xab")
        with _pytest.raises(FlacError, match="exhausted"):
            br.read(9)
        # unary running off the end of all-zero bytes raises too
        br = _BitReader(b"\x00\x00")
        with _pytest.raises(FlacError, match="exhausted"):
            br.read_unary()

    def test_crc_tables_match_bitwise_definition(self):
        import random

        from delta_sharing_spark.operators.flac import _crc8, _crc16

        def crc8_ref(data):
            crc = 0
            for b in data:
                crc ^= b
                for _ in range(8):
                    crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                        else (crc << 1) & 0xFF
            return crc

        def crc16_ref(data):
            crc = 0
            for b in data:
                crc ^= b << 8
                for _ in range(8):
                    crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                        else (crc << 1) & 0xFFFF
            return crc

        rng = random.Random(21)
        for _ in range(50):
            data = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(0, 200)))
            assert _crc8(data) == crc8_ref(data)
            assert _crc16(data) == crc16_ref(data)

    def test_fixed_predictor_orders_0_to_4(self):
        """Hand-built FIXED subframes for EVERY order (the encoder only
        emits 0-2, so 3-4 have no round-trip coverage) decode to the
        generic coefficient-fold reference."""
        import random

        from delta_sharing_spark.operators.flac import (
            _FIXED_COEFFS, _BitReader, _BitWriter, _decode_subframe, _fold)

        rng = random.Random(5)
        bs = 32
        for order in range(5):
            warm = [rng.randint(-3000, 3000) for _ in range(order)]
            res = [rng.randint(-40, 40) for _ in range(bs - order)]
            k = 5
            bw = _BitWriter()
            bw.write(0, 1)                      # subframe pad bit
            bw.write(0b001000 | order, 6)       # FIXED, this order
            bw.write(0, 1)                      # no wasted bits
            for v in warm:
                bw.write(v & 0xFFFF, 16)
            bw.write(0, 2)                      # residual method 0
            bw.write(0, 4)                      # partition order 0
            bw.write(k, 4)                      # rice parameter
            for r in res:
                u = _fold(r)
                bw.write_unary(u >> k)
                bw.write(u & ((1 << k) - 1), k)
            bw.align()
            got = _decode_subframe(_BitReader(bytes(bw.out)), bs, 16)
            # reference: the generic per-sample coefficient fold
            want = list(warm)
            coeffs = _FIXED_COEFFS[order]
            for i in range(order, bs):
                pred = sum(c * want[i - j - 1]
                           for j, c in enumerate(coeffs))
                want.append(pred + res[i - order])
            assert got == want, f"order {order}"
