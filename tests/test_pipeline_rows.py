"""Tests for the round-5 training-pipeline rows: PII redaction, exact-span
dedup, unigram-LM quality, content-hash sharding, and the bucketed
co-located join."""

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.functions import text as TX
from bharatmlstack_spark.queries import all_queries


@pytest.fixture(scope="module")
def qs():
    return all_queries()


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_patterns_detect_and_redact(spark):
    rows = [
        ("mail me at a.b+c@x-corp.io today", 1, 0, 0),
        ("call +91-9876543210 or +44-1234567890", 0, 2, 0),
        ("server 192.168.0.1 and 10.0.255.3", 0, 0, 2),
        ("no pii here at all", 0, 0, 0),
        ("x@y.io +12-0000000000 1.2.3.4", 1, 1, 1),
    ]
    df = spark.createDataFrame(
        [(t,) for t, *_ in rows], "text string"
    ).select(
        "text",
        TX.pii_count("text", TX.EMAIL_RE).alias("e"),
        TX.pii_count("text", TX.PHONE_RE).alias("p"),
        TX.pii_count("text", TX.IPV4_RE).alias("i"),
        TX.redact_pii("text").alias("clean"),
    )
    got = df.collect()
    for (text, e, p, i), r in zip(rows, got):
        assert (r.e, r.p, r.i) == (e, p, i), text
        # redacted output never matches any PII pattern again
        assert "@" not in r.clean or "[EMAIL]" in r.clean
        for pat in (TX.EMAIL_RE, TX.PHONE_RE, TX.IPV4_RE):
            import re

            assert not re.search(pat, r.clean.replace("[EMAIL]", "").replace(
                "[PHONE]", "").replace("[IP]", "")), (text, r.clean)


def test_pii_redact_row_negatives_have_zero_counts(spark, sf_dir, qs):
    out = qs["pii_redact"](spark, sf_dir)
    neg = out.filter(F.col("doc_id") % 3 == 2)
    assert neg.filter(
        (F.col("n_emails") != 0) | (F.col("n_phones") != 0) | (F.col("n_ips") != 0)
    ).count() == 0
    pos = out.filter(F.col("doc_id") % 3 != 2)
    assert pos.filter((F.col("n_emails") != 1) | (F.col("n_phones") != 1)).count() == 0
    assert pos.filter(F.col("n_chars_removed") <= 0).count() == 0


# ---------------------------------------------------------------------------
# exact-span dedup
# ---------------------------------------------------------------------------


def test_span_dedup_exact_copies_fully_duplicated(spark, sf_dir, qs):
    out = qs["span_dedup_exact"](spark, sf_dir)
    # corpus() injects exact copies at doc_id+10000 for doc_id % 25 == 0:
    # every span of a copied doc also exists in its source -> ratio 1.0
    copies = out.filter((F.col("doc_id") >= 10000) & (F.col("doc_id") < 20000))
    assert copies.count() > 0
    assert copies.filter(F.col("dup_ratio") < 1.0).count() == 0
    # and nobody reports more duplicated spans than spans
    assert out.filter(F.col("n_dup_spans") > F.col("n_spans")).count() == 0


# ---------------------------------------------------------------------------
# unigram LM quality
# ---------------------------------------------------------------------------


def test_unigram_lm_scores_are_log_probs(spark, sf_dir, qs):
    out = qs["unigram_lm_quality"](spark, sf_dir)
    # avg log-prob is strictly negative (no token has probability 1)
    assert out.filter(F.col("avg_logp") >= 0).count() == 0
    assert out.filter(F.col("n_tokens") <= 0).count() == 0
    # a doc made entirely of the corpus's most common tokens must score
    # higher than one of the rarest: check max spread is non-degenerate
    stats = out.agg(F.min("avg_logp"), F.max("avg_logp")).head()
    assert stats[0] < stats[1]


# ---------------------------------------------------------------------------
# shard manifest
# ---------------------------------------------------------------------------


def test_shard_manifest_accounts_for_every_doc(spark, sf_dir, qs):
    out = qs["shard_manifest"](spark, sf_dir)
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = out.collect()
    assert sum(r.n_docs for r in rows) == total_docs
    # shard ids are the 16 hex prefixes, content-addressed
    assert all(r.shard_id.startswith("s") and len(r.shard_id) == 2 for r in rows)
    assert len({r.shard_id for r in rows}) == len(rows)


def test_shard_assignment_is_content_addressed(spark):
    # identical text -> identical shard, regardless of doc_id
    df = spark.createDataFrame(
        [(1, "same words"), (99, "same words"), (2, "other words")],
        "doc_id long, text string",
    ).select(F.substring(F.md5("text"), 1, 1).alias("shard"), "doc_id")
    got = {r.doc_id: r.shard for r in df.collect()}
    assert got[1] == got[99]


# ---------------------------------------------------------------------------
# bucketed co-located join
# ---------------------------------------------------------------------------


def test_bucketed_join_has_zero_exchanges(spark, sf_dir, qs):
    from bharatmlstack_spark.plans import explain_formatted, shuffle_count

    df = qs["bucketed_colocated_join"](spark, sf_dir)
    # the whole plan — join AND the groupBy on the bucket key — rides the
    # write-time bucket distribution: not a single shuffle
    assert shuffle_count(df) == 0
    assert "SortMergeJoin" in explain_formatted(df) or "BroadcastHashJoin" in (
        explain_formatted(df)
    )


def test_bucketed_join_matches_plain_join(spark, sf_dir, qs):
    df = qs["bucketed_colocated_join"](spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.cust: r.n_orders for r in df.collect()}
    want = {r.c_custkey: r.n for r in plain.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# corpus filter chain + BPE merge step
# ---------------------------------------------------------------------------


def test_filter_chain_rules_all_fire_and_order_wins(spark, sf_dir, qs):
    out = qs["corpus_filter_chain"](spark, sf_dir)
    verdicts = {r.verdict for r in out.select("verdict").distinct().collect()}
    assert "keep" in verdicts and "too_short" in verdicts
    # first-failure semantics: a too-short doc is never labelled by a
    # later rule even if also repetitive
    bad = out.filter((F.col("n_words") < 15) & (F.col("verdict") != "too_short"))
    assert bad.count() == 0


def test_bpe_merge_step_counts(spark, sf_dir):
    # bpe_merge_step retired r15 (staged tier) — the invariants under
    # test live on the function itself
    from bharatmlstack_spark.queries_text import bpe_merge_step

    out = bpe_merge_step(spark, sf_dir).collect()
    assert len(out) == 20
    # descending counts, all pairs are 2 chars
    cnts = [r.cnt for r in out]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r.pair) == 2 for r in out)


def test_bpe_vocab_learn_merges_are_real(spark, sf_dir, qs):
    out = qs["bpe_vocab_learn"](spark, sf_dir).collect()
    merges = {r.step: r for r in out if r.step > 0}
    vocab = {r.token: r.cnt for r in out if r.step == 0}
    assert set(merges) == {1, 2, 3} and len(vocab) == 20
    # each learned merge is a real multi-char token that survives into the
    # final vocabulary (merged symbols are never re-split)
    for r in merges.values():
        assert len(r.token) >= 2
        assert r.token in vocab
    # merge counts are non-increasing: a later round can never find a
    # better pair than an earlier round chose
    assert merges[1].cnt >= merges[2].cnt >= merges[3].cnt


def test_bpe_tokenize_apply_bounds(spark, sf_dir, qs):
    """Token counts respect the compression laws: a word never encodes to
    more tokens than characters (merges only shrink), never fewer than 1,
    and the corpus-wide token total is strictly below the character total
    (the three learned merges actually fire somewhere)."""
    out = qs["bpe_tokenize_apply"](spark, sf_dir)
    bad = out.filter(
        (F.col("n_tokens") < F.col("n_words")) | (F.col("n_tokens") <= 0)
    )
    assert bad.count() == 0
    tot = out.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w")
    ).head()
    # the un-merged encoding has exactly one token per CHARACTER; strictly
    # fewer proves the learned merges actually fired on real documents
    chars = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
        .agg(F.sum(F.length("w")).alias("c"))
        .head()
        .c
    )
    assert tot.t >= tot.w  # every word is at least one token
    assert tot.t < chars  # merges compressed the corpus


def test_bpe_greedy_merge_encoding_laws(spark):
    """The ' sym|' encoding makes plain replace() the greedy BPE merge:
    back-to-back runs chain, and a pair never matches inside a longer
    symbol (prefix/suffix anchoring)."""
    from bharatmlstack_spark.queries_text import _BPE_MERGE

    df = spark.createDataFrame(
        [
            (" a| a| a| a| a|", "a a"),   # run of 5 -> aa aa a
            (" a| ab|", "a a"),           # 'ab' prefix must NOT match
            (" xa| a|", "a a"),           # 'xa' suffix must NOT match
            (" e| r| e| r|", "e r"),      # non-adjacent pair merges both
        ],
        "s string, pair string",
    )
    got = [r.m for r in df.select(F.expr(_BPE_MERGE).alias("m")).collect()]
    assert got == [" aa| aa| a|", " a| ab|", " xa| a|", " er| er|"]


# ---------------------------------------------------------------------------
# cohort retention + SCD2
# ---------------------------------------------------------------------------


def test_cohort_offset_zero_counts_whole_cohort(spark, sf_dir, qs):
    out = qs["cohort_retention"](spark, sf_dir).collect()
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_users
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets  # every user is active in their own first week
        # retention never exceeds the cohort's size
        assert all(n <= offsets[0] for n in offsets.values())


def test_scd2_intervals_partition_the_timeline(spark, sf_dir, qs):
    out = qs["scd2_dimension"](spark, sf_dir).collect()
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in out:
        per_user[r.user_id].append(r)
    for uid, rows in per_user.items():
        rows.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval, and it is the last one
        opens = [r for r in rows if r.valid_to is None]
        assert len(opens) == 1 and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from - 1  # gap-free, non-overlapping
            assert a.event_type != b.event_type  # runs were collapsed


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def _file_stats(df):
    part = df.withColumn("p", F.spark_partition_id())
    return part.groupBy("p").agg(
        F.min("user_id").alias("u0"), F.max("user_id").alias("u1"),
        F.min("week").alias("w0"), F.max("week").alias("w1"),
    ).collect()


def _match_fraction(stats, vals, lo, hi):
    hits = sum(
        sum(1 for s in stats if getattr(s, lo) <= v <= getattr(s, hi))
        for v in vals
    )
    return hits / (len(vals) * len(stats))


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir):
    from bharatmlstack_spark.plans.zorder import zorder_layout
    from bharatmlstack_spark.sources.events import load_events_ms

    ev = load_events_ms(spark, sf_dir).select(
        "user_id", (F.col("ts_ms") / F.lit(604800000)).cast("bigint").alias("week")
    )
    wk0 = ev.agg(F.min("week")).head()[0]
    ev = ev.withColumn("week", F.col("week") - F.lit(wk0))
    users = [r.user_id for r in ev.select("user_id").distinct().collect()]
    weeks = [r.week for r in ev.select("week").distinct().collect()]

    z = _file_stats(zorder_layout(ev, "user_id", "week", 8, bits=8))
    by_week = _file_stats(ev.repartitionByRange(8, "week").sortWithinPartitions("week"))
    by_user = _file_stats(
        ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
    )

    # single-column sorts: the OTHER dimension cannot prune (hits ~every file)
    assert _match_fraction(by_week, users, "u0", "u1") > 0.9
    assert _match_fraction(by_user, weeks, "w0", "w1") > 0.9
    # z-order: BOTH dimensions prune below full scan — the property that
    # makes the layout worth one extra sort at write time
    zu = _match_fraction(z, users, "u0", "u1")
    zw = _match_fraction(z, weeks, "w0", "w1")
    assert zu < 0.9 and zw < 0.9, (zu, zw)


def test_z_value_bit_interleave_exact(spark):
    from bharatmlstack_spark.plans.zorder import z_value

    rows = [(a, b) for a in (0, 1, 2, 3, 170, 255) for b in (0, 1, 85, 255)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", z_value("a", "b", bits=8).alias("z")
    )

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in df.collect():
        assert r.z == ref(r.a, r.b), (r.a, r.b)


# ---------------------------------------------------------------------------
# fuzzy name match
# ---------------------------------------------------------------------------


def test_fuzzy_match_blocking_is_exact_for_lev1(spark, sf_dir, qs):
    out = qs["fuzzy_name_match"](spark, sf_dir)
    rows = out.collect()
    assert all(r.dist == 1 for r in rows)  # distinct names at distance 1
    # ground truth on the bounded slice: brute-force pair check
    names = {
        r.c_custkey: r.c_name
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") < 600)
        .collect()
    }
    import itertools

    def lev1(a, b):
        return len(a) == len(b) and sum(x != y for x, y in zip(a, b)) == 1

    want = {
        (i, j)
        for i, j in itertools.combinations(sorted(names), 2)
        if lev1(names[i], names[j])
    }
    got = {(r.id_a, r.id_b) for r in rows}
    assert got == want


# ---------------------------------------------------------------------------
# profile_table SQL-identifier safety
# ---------------------------------------------------------------------------


def test_profile_table_handles_awkward_column_names(spark):
    from bharatmlstack_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y")],
        ["order id", "O'Brien", "plain"],
    )
    rows = {r.column_name: r for r in profile_table(df).collect()}
    assert set(rows) == {"order id", "O'Brien", "plain"}
    assert rows["O'Brien"].n_nulls == 1
    assert rows["order id"].vmin == 1.0 and rows["order id"].vmax == 2.0


def test_bucketed_table_prunes_buckets_on_point_lookup(spark, sf_dir, qs):
    # run the row once so the bucketed catalog tables exist; names carry a
    # per-invocation token now (collision fix), so locate by prefix —
    # older invocations' tables were dropped when this one started
    qs["bucketed_colocated_join"](spark, sf_dir).count()
    names = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("bmls_bucketed_orders_")
    ]
    assert len(names) == 1, names
    df = (
        spark.table(names[0])
        .filter(F.col("o_custkey") == 7)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a point lookup on the bucket key reads 1 bucket, not the table —
    # the second payoff of the write-time layout (first: shuffle-free joins)
    assert "SelectedBucketsCount: 1 out of 8" in plan


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark semantics envelope
# ---------------------------------------------------------------------------


def _run_dedup_stream(spark, work, topic, out):
    s = (
        spark.readStream.schema("event_id long, ts_ms long")
        .parquet(topic)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        s.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{work}/c")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_watermark_dedup_guarantee_envelope(spark, tmp_path):
    """The operator's guarantee is dedup WITHIN the watermark delay:
    (a) a redelivery carrying its ORIGINAL (now-late) timestamp is
        watermark-dropped, so the sink stays exactly-once;
    (b) a redelivery with a FRESH timestamp after the key's state
        evicted (watermark passed first-seen + delay) IS re-emitted —
        the documented bound that keeps state finite on infinite
        streams. Both sides pinned so a Spark upgrade that moves either
        boundary fails loudly."""
    t2 = 7200 * 1000 + 1000  # 2h after the first event -> watermark = t2-1h

    # (a) original-ts redelivery: dropped as late
    work = str(tmp_path / "evict_a")
    topic, out = f"{work}/t", f"{work}/o"
    spark.createDataFrame(
        [(1, 1000), (2, t2)], "event_id long, ts_ms long"
    ).coalesce(1).write.parquet(topic)
    _run_dedup_stream(spark, work, topic, out)
    spark.createDataFrame([(1, 1000)], "event_id long, ts_ms long").coalesce(
        1
    ).write.mode("append").parquet(topic)
    _run_dedup_stream(spark, work, topic, out)
    got = sorted((r.event_id, r.ts_ms) for r in spark.read.parquet(out).collect())
    assert got == [(1, 1000), (2, t2)]

    # (b) fresh-ts redelivery after eviction: re-emitted
    work = str(tmp_path / "evict_b")
    topic, out = f"{work}/t", f"{work}/o"
    spark.createDataFrame(
        [(1, 1000), (2, t2)], "event_id long, ts_ms long"
    ).coalesce(1).write.parquet(topic)
    _run_dedup_stream(spark, work, topic, out)
    spark.createDataFrame(
        [(1, t2 + 1000)], "event_id long, ts_ms long"
    ).coalesce(1).write.mode("append").parquet(topic)
    _run_dedup_stream(spark, work, topic, out)
    got = sorted((r.event_id, r.ts_ms) for r in spark.read.parquet(out).collect())
    assert got == [(1, 1000), (1, t2 + 1000), (2, t2)]


def test_scd2_point_in_time_join_is_exact(spark, sf_dir, qs):
    """Every source event must land in EXACTLY ONE validity interval of
    its user's SCD2 history, and that interval's event_type must equal
    the event's own — the point-in-time-join correctness property that
    makes the dimension usable for leakage-free feature backfills."""
    from bharatmlstack_spark.sources.events import load_events_ms

    dim = qs["scd2_dimension"](spark, sf_dir)
    ev = load_events_ms(spark, sf_dir).filter(F.col("user_id") % 50 == 3).select(
        "event_id", "user_id", "ts_ms", F.col("event_type").alias("ev_type")
    )
    joined = ev.join(dim, on="user_id").filter(
        (F.col("ts_ms") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts_ms") <= F.col("valid_to")))
    )
    per_event = joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.max((F.col("ev_type") == F.col("event_type")).cast("int")).alias("type_ok"),
    )
    assert per_event.filter(F.col("n_intervals") != 1).count() == 0
    assert per_event.filter(F.col("type_ok") != 1).count() == 0
    assert per_event.count() == ev.count()


def test_pagerank_is_deterministic_across_partitionings(spark, sf_dir, qs):
    # integer fixed-point arithmetic: identical ranks regardless of
    # shuffle partitioning (a float PageRank would drift in the fold)
    a = {(r.node, r.rank_micro) for r in qs["pagerank_copurchase"](spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {(r.node, r.rank_micro) for r in qs["pagerank_copurchase"](spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
    assert all(r > 150000 for _, r in a)  # every top node has inbound mass
