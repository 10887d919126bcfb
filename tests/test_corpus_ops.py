"""Unit tests for sampling (mix/negative) and profiling/binning operators."""

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators import profile as PR
from bharatmlstack_spark.operators import sampling as SP


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# mix_sample
# ---------------------------------------------------------------------------


def test_mix_sample_deterministic_and_rated(docs):
    rates = {"en": 1.0, "zh": 0.0}
    out = SP.mix_sample(docs, "lang", "doc_id", rates).select("doc_id", "lang")
    rows = {r.doc_id for r in out.collect()}
    again = {r.doc_id for r in SP.mix_sample(docs, "lang", "doc_id", rates).collect()}
    assert rows == again
    en_total = docs.filter(F.col("lang") == "en").count()
    assert out.filter(F.col("lang") == "en").count() == en_total  # rate 1.0 keeps all
    assert out.filter(F.col("lang") == "zh").count() == 0  # rate 0.0 drops all
    assert out.filter(~F.col("lang").isin("en", "zh")).count() == 0  # default 0.0


def test_mix_sample_nested_supersets(docs):
    small = {r.doc_id for r in SP.mix_sample(docs, "lang", "doc_id", {"en": 0.2}).collect()}
    big = {r.doc_id for r in SP.mix_sample(docs, "lang", "doc_id", {"en": 0.6}).collect()}
    assert small <= big  # raising the rate only adds docs, never swaps them


# ---------------------------------------------------------------------------
# negative_sample
# ---------------------------------------------------------------------------


def test_negative_sample_excludes_positives_and_caps_k(spark):
    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], ["user_id", "item_id"]
    )
    users = spark.createDataFrame([(1,), (2,), (3,)], ["user_id"])
    items = spark.createDataFrame([(i,) for i in range(10, 16)], ["item_id"])
    out = SP.negative_sample(pos, "user_id", "item_id", users, items, k=3)
    got = [(r.user_id, r.item_id) for r in out.collect()]
    assert len(got) == 9  # 3 users x k=3
    assert (1, 10) not in got and (1, 11) not in got and (2, 10) not in got
    per_user = {}
    for u, _ in got:
        per_user[u] = per_user.get(u, 0) + 1
    assert per_user == {1: 3, 2: 3, 3: 3}


def test_negative_sample_matches_window_reference(spark):
    """r17: the anti-join + row_number window was replaced by an in-row
    array_except + struct array_sort + slice (shuffle |pos| rows, not
    |users| x |items| candidates). Pin the selection AND rank order
    against a pure-Python replay of the old window semantics: per user,
    non-positive items ordered by (mix score asc, item asc), first k."""
    users = spark.createDataFrame([(u,) for u in (0, 3, 7, 1 << 21)], ["u"])
    items = spark.createDataFrame([(i,) for i in range(100, 140)], ["i"])
    pos_rows = [(3, i) for i in range(100, 135)] + [(7, 101), (7, 101), (7, 120)]
    pos = spark.createDataFrame(pos_rows, ["u", "i"])
    out = SP.negative_sample(pos, "u", "i", users, items, k=4)
    got = sorted((r.u, r.i) for r in out.collect())

    def mix(u, i):
        return (
            (u % (1 << 20)) * 1000003
            + (u >> 20) * 7919
            + (i % (1 << 20)) * 2654435761
            + (i >> 20) * 40503
        ) % 999999937

    posset = set(pos_rows)
    want = []
    for u in (0, 3, 7, 1 << 21):
        negs = [i for i in range(100, 140) if (u, i) not in posset]
        negs.sort(key=lambda i: (mix(u, i), i))
        want += [(u, i) for i in negs[:4]]
    assert got == sorted(want)
    # user 3 has only 5 eligible items -> still exactly k of them chosen
    assert sum(1 for u, _ in got if u == 3) == 4


def test_negative_sample_k_larger_than_pool(spark):
    pos = spark.createDataFrame([(1, 10)], ["u", "i"])
    users = spark.createDataFrame([(1,)], ["u"])
    items = spark.createDataFrame([(10,), (11,)], ["i"])
    out = SP.negative_sample(pos, "u", "i", users, items, k=5)
    assert [(r.u, r.i) for r in out.collect()] == [(1, 11)]


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_table_counts_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, "b"), (4, 4.0, None)],
        ["k", "v", "s"],
    )
    out = {r.column_name: r for r in PR.profile_table(df).collect()}
    assert out["k"].n_nulls == 0 and out["k"].n_distinct == 4
    assert out["k"].vmin == 1.0 and out["k"].vmax == 4.0
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    assert out["v"].vmin == 2.0 and out["v"].vmax == 4.0
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].vmin is None and out["s"].vmax is None


# ---------------------------------------------------------------------------
# quantile_bin
# ---------------------------------------------------------------------------


def test_quantile_bin_equal_frequency(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], ["k", "x"])
    out = PR.quantile_bin(df, "x", n_buckets=10, keep=["k"])
    counts = {r.bucket: r.cnt for r in out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == set(range(1, 11))
    assert all(c == 10 for c in counts.values())  # uniform data -> exact deciles
    # monotone: higher value never lands in a lower bucket
    rows = sorted((r.k, r.bucket) for r in out.collect())
    buckets = [b for _, b in rows]
    assert buckets == sorted(buckets)


def test_quantile_bin_constant_column(spark):
    df = spark.createDataFrame([(i, 7.0) for i in range(5)], ["k", "x"])
    out = PR.quantile_bin(df, "x", n_buckets=4, keep=["k"])
    assert {r.bucket for r in out.collect()} == {1}  # all boundaries equal -> bucket 1


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def test_connected_components_chain_and_clique(spark):
    from bharatmlstack_spark.operators.graph import connected_components

    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), clique 10-11-12,
    # isolated node 99 via the nodes universe
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], ["id"])
    out = {r.node: r.component for r in connected_components(edges, nodes=nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_endpoints_only(spark):
    from bharatmlstack_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(5, 6)], ["id_a", "id_b"])
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {5: 5, 6: 5}


# ---------------------------------------------------------------------------
# cardinality sketch error bound
# ---------------------------------------------------------------------------


def test_sketch_distinct_error_under_5pct(spark, sf_dir):
    from bharatmlstack_spark.sources.events import load_events_raw

    ev = load_events_raw(spark, sf_dir)
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r.event_type: r.a
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)


# ---------------------------------------------------------------------------
# chunking + packing
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from bharatmlstack_spark.operators.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))  # 100 words
    df = spark.createDataFrame([(1, text), (2, "just three words")], ["doc_id", "text"])
    out = chunk_documents(df, window=50, stride=40)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: ceil((100-50)/40)=2 extra -> chunks 0,1,2
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)].chunk_text.split(" ")[0] == "w0"
    assert rows[(1, 1)].chunk_text.split(" ")[0] == "w40"  # stride 40
    assert rows[(1, 0)].chunk_text.split(" ")[40:] == rows[(1, 1)].chunk_text.split(" ")[:10]
    assert rows[(1, 2)].n_words == 20  # tail chunk: words 80..99
    # short doc: one whole chunk
    assert rows[(2, 0)].chunk_text == "just three words" and rows[(2, 0)].n_words == 3
    assert {k for k in rows if k[0] == 2} == {(2, 0)}


def test_chunk_documents_rejects_bad_stride(spark):
    from bharatmlstack_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, window=10, stride=20)


def test_pack_sequences_offsets_and_bins(spark):
    from bharatmlstack_spark.operators.chunking import pack_sequences

    # one shard (n_shards=1): docs of 300 tokens -> offsets 0,300,600,900
    df = spark.createDataFrame([(i, 300) for i in range(4)], ["doc_id", "n_tokens"])
    out = {r.doc_id: r for r in pack_sequences(df, budget=512, n_shards=1).collect()}
    assert [out[i].tokens_before for i in range(4)] == [0, 300, 600, 900]
    assert [out[i].bin for i in range(4)] == [0, 0, 1, 1]  # straddler stays in start bin
    assert all(out[i].shard == 0 for i in range(4))


def test_pack_sequences_sharding_is_disjoint(spark):
    from bharatmlstack_spark.operators.chunking import pack_sequences

    df = spark.createDataFrame([(i, 10) for i in range(40)], ["doc_id", "n_tokens"])
    out = pack_sequences(df, budget=100, n_shards=4)
    per_shard = {
        r.shard: r.n for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert per_shard == {0: 10, 1: 10, 2: 10, 3: 10}
    # offsets restart per shard
    assert out.filter((F.col("tokens_before") == 0)).count() == 4


def test_sketch_percentile_close_to_exact(spark, sf_dir):
    from bharatmlstack_spark.sources.events import load_events_raw

    ev = load_events_raw(spark, sf_dir)
    approx = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type")
        .agg(F.expr("approx_percentile(value, array(0.5, 0.95), 10000)").alias("p"))
        .select("event_type", F.col("p")[0].alias("p50"), F.col("p")[1].alias("p95"))
        .collect()
    }
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    for et, (a50, a95) in approx.items():
        e50, e95 = exact[et]
        # accuracy=10000 -> rank error ~1e-4; allow small value slack
        assert abs(a50 - e50) <= max(0.05 * abs(e50), 0.3), (et, a50, e50)
        assert abs(a95 - e95) <= max(0.05 * abs(e95), 0.3), (et, a95, e95)


def test_heavy_hitters_matches_direct_groupby(spark, sf_dir):
    """The two-pass candidate/recount path returns exactly the direct
    full-shuffle answer, regardless of input partitioning."""
    from pyspark.sql import functions as F

    from bharatmlstack_spark.operators.profile import heavy_hitters

    words = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    )
    direct = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(words.agg(F.count(F.lit(1)).alias("n"))))
        .filter(F.col("cnt") * 200 >= 7 * F.col("n"))
    )
    want = {(r.w, r.cnt) for r in direct.collect()}
    assert want  # non-vacuous at every sf
    for parts in (1, 13):
        got = {
            (r.value, r.cnt)
            for r in heavy_hitters(
                words.repartition(parts), "w", 7, 200
            ).collect()
        }
        assert got == want


def test_heavy_hitters_candidate_cap_binds(spark):
    """With top_per_partition=1 on a single partition, only the modal
    value can surface — proving pass 1 really bounds the candidate set
    (the scale contract) rather than silently passing everything."""
    from pyspark.sql import functions as F

    from bharatmlstack_spark.operators.profile import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)], "w string"
    ).coalesce(1)
    out = heavy_hitters(df, "w", 1, 10, top_per_partition=1).collect()
    assert {(r.value, r.cnt) for r in out} == {("a", 6)}
