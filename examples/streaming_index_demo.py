"""End-to-end demo: a corpus arriving as a STREAM -> live dedup + ANN index.

The streaming half of the corpus toolkit (reference analog: skye's
realtime indexer consumers, skye/internal/consumers/handler/indexer/):
documents arrive in micro-batches and the pipeline maintains, incrementally,

  1. an exact-duplicate filter (fingerprint state, anti-join per batch)
  2. a NEAR-duplicate pair log (MinHash-LSH: append-only band index,
     each batch probes the accumulated index, exact-Jaccard verified)
  3. a searchable IVF ANN index over the embedding stream (frozen coarse
     quantizer, cell-partitioned appends) — queried at the end

All three are append-only or bucket-scoped: a batch pays for ITS data,
never a corpus rewrite — the property that matters when the corpus is
100 TB and the stream never stops. Deterministic under at-least-once
redelivery (the demo replays the whole topic a second time to prove it).

    python examples/streaming_index_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.operators.lsh import IvfIndex
from bharatmlstack_spark.streaming.ingest import (
    await_stream,
    cross_dedup_against_state,
    load_streamed_index_quantizer,
    maintenance_due,
    maybe_compact_streamed_index,
    read_streamed_ivf_index,
    refit_due,
    refit_streamed_index,
    stream_ann_ivf_sink,
    stream_dedup_sink,
    stream_neardup_minhash_sink,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-index-demo")
    work = tempfile.mkdtemp(prefix="stream_demo_")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # simulate a topic: 3 parquet files consumed one per micro-batch
    topic = f"{work}/topic"
    docs.unionAll(docs.limit(20)).repartition(3).write.parquet(topic)  # 20 dup deliveries
    doc_schema = "doc_id bigint, text string"

    def topic_stream():
        return (
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(topic)
        )

    # 1. exact-dup filter: fingerprint state, batch anti-joins the past
    print("== 1. streaming exact dedup (fingerprint state) ==")
    q = stream_dedup_sink(
        topic_stream(), f"{work}/exact_state", f"{work}/exact_out",
        f"{work}/ck_exact", spark, id_col="doc_id", content_col="text",
        trigger_once=True,
    )
    await_stream(q, 300)
    kept = spark.read.parquet(f"{work}/exact_out")
    print(f"unique docs kept: {kept.count()} of {docs.count() + 20} delivered")

    # 2. near-dup pairs: append-only band index, probe per batch, replay
    print("== 2. streaming near-dup (MinHash-LSH band index), with a full replay ==")
    for ck in ("ck_near1", "ck_near2"):  # second pass: full redelivery
        q = stream_neardup_minhash_sink(
            topic_stream(), f"{work}/near_state", f"{work}/near_pairs",
            f"{work}/{ck}", spark, id_col="doc_id", text_col="text",
            threshold=0.8, trigger_once=True,
        )
        await_stream(q, 300)
    pairs = spark.read.parquet(f"{work}/near_pairs").dropDuplicates(["id_a", "id_b"])
    print(f"near-dup pairs (jaccard >= 0.8), deduped after replay: {pairs.count()}")

    # 2b. the accumulated state doubles as a DECONTAMINATION reference:
    # an incoming delta (here: near-copies of 3 indexed docs) probes the
    # persisted bands/sets — the reference corpus is banded once, each
    # delta pays only for itself; signature params come from the sidecar
    incoming = docs.filter(F.col("doc_id") % 100 == 7).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    hits = cross_dedup_against_state(
        spark, f"{work}/near_state", incoming, threshold=0.8
    )
    print(
        f"decontamination probe: {incoming.count()} incoming docs, "
        f"{hits.count()} flagged against the indexed corpus"
    )

    # 3. streamed IVF index over embeddings; search it at the end
    print("== 3. stream-built IVF ANN index ==")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cands = emb.filter(F.col("vec_id") >= 5)
    ivf = IvfIndex(n_cells=8).fit(cands, sample_size=256, iters=2)  # frozen quantizer
    etopic = f"{work}/etopic"
    cands.select("vec_id", "embedding").repartition(3).write.parquet(etopic)
    estream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(etopic)
    )
    q = stream_ann_ivf_sink(estream, ivf, f"{work}/ivf_index", f"{work}/ck_ivf", spark,
                            trigger_once=True)
    await_stream(q, 300)
    # replay the whole topic under a fresh checkpoint: at-least-once
    # redelivery doubles every index row...
    estream2 = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(etopic)
    )
    q2 = stream_ann_ivf_sink(estream2, ivf, f"{work}/ivf_index",
                             f"{work}/ck_ivf_replay", spark, trigger_once=True)
    await_stream(q2, 300)
    # ...and the maintenance-cadence POLICY decides compaction for you:
    # the replay's restarted batch ids flag redelivery_suspected in the
    # index's meta sidecar, so maintenance is due even far below the
    # batch-count threshold — no hand-invented cadence
    assert maintenance_due(spark, f"{work}/ivf_index", every_n_batches=1000)
    removed = maybe_compact_streamed_index(
        spark, f"{work}/ivf_index", every_n_batches=1000
    )
    print(f"maintenance due (redelivery observed): compacted {removed} rows")
    # the pass reset the counters: the next call is a sidecar-read no-op
    assert maybe_compact_streamed_index(spark, f"{work}/ivf_index") is None
    index = read_streamed_ivf_index(
        spark, f"{work}/ivf_index", id_col="vec_id", dedup=False
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    hits = ivf.search(index, queries, k=5, nprobe=4, metric="DOT")
    print("top-5 neighbors per query from the streamed index:")
    hits.orderBy("query_id", "rank").show()

    # 4. the stream has outgrown the bootstrap quantizer: the refit_due
    # POLICY decides it from the same sidecar the sink maintains (one
    # read — rows_appended vs n_cells x target_cell_rows), then
    # refit_streamed_index derives n_cells from the ACCUMULATED count,
    # re-fits + re-assigns, and marker-commits the staged swap (the skye
    # indexer reset-job analog; compaction alone never re-buckets, so
    # per-cell population would grow with the stream)
    print("== 4. refit: re-bucket the index the stream outgrew ==")
    assert refit_due(spark, f"{work}/ivf_index", target_cell_rows=16)
    stats = refit_streamed_index(
        spark, f"{work}/ivf_index", target_cell_rows=16, min_cells=8
    )
    print(
        f"refit_due -> refit {stats['n']} vectors: "
        f"{stats['n_cells_before']} -> {stats['n_cells_after']} cells "
        f"(+{stats['rows_removed']} dup rows reclaimed)"
    )
    # the refit reset the bookkeeping: not due again at the same target
    assert not refit_due(spark, f"{work}/ivf_index", target_cell_rows=16)
    ivf2 = stats["ivf"]  # subsequent appends/searches use the NEW quantizer
    hits2 = ivf2.search(
        read_streamed_ivf_index(spark, f"{work}/ivf_index", dedup=False),
        queries, k=5, nprobe=4, metric="DOT",
    )
    print("same queries against the re-bucketed index:")
    hits2.orderBy("query_id", "rank").show()

    # a RESTARTED sink must hold the refit quantizer: the persisted
    # __quantizer sidecar arms a start-time guard — the stale bootstrap
    # quantizer is refused loudly instead of silently mis-routing probes
    late = emb.filter(F.col("vec_id") < 2).select("vec_id", "embedding")
    ltopic = f"{work}/ltopic"
    late.write.parquet(ltopic)

    def _late_stream():
        return spark.readStream.schema(
            "vec_id bigint, embedding array<float>"
        ).parquet(ltopic)

    try:
        stream_ann_ivf_sink(
            _late_stream(), ivf, f"{work}/ivf_index", f"{work}/ck_stale",
            spark, trigger_once=True,
        )
        raise AssertionError("stale quantizer was not refused")
    except RuntimeError as e:
        print(f"stale-quantizer append refused as designed: {str(e)[:80]}...")
    q = stream_ann_ivf_sink(
        _late_stream(),
        load_streamed_index_quantizer(spark, f"{work}/ivf_index"),
        f"{work}/ivf_index", f"{work}/ck_fresh", spark, trigger_once=True,
    )
    await_stream(q, 300)
    print("restart with the persisted (refit) quantizer: appended OK")

    # 5. streamed inverted index: BM25 through term-bucket postings.
    # NOTE: sections 1-3 use a topic with 20 intra-topic duplicate doc
    # ids (the dedup showcase); the postings sink's contract is each doc
    # id arrives ONCE (corpus build), so this section replays a clean
    # topic — redelivery duplication still comes from the second
    # checkpoint pass below.
    print("== 5. streamed inverted index (BM25 postings) ==")
    ptopic = f"{work}/ptopic"
    docs.repartition(3).write.parquet(ptopic)

    def ptopic_stream():
        return (
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ptopic)
        )

    from bharatmlstack_spark.streaming.ingest import (
        bm25_search_streamed,
        compact_streamed_postings,
        delete_postings_docs,
        fold_postings_tombstones,
        maybe_compact_streamed_postings,
        purge_docs_everywhere,
        rebucket_postings_index,
        stream_postings_sink,
    )

    pindex = f"{work}/postings_index"
    for ck in ("ck_post1", "ck_post2"):  # second pass: full redelivery
        q = stream_postings_sink(
            ptopic_stream(), pindex, f"{work}/{ck}", spark,
            n_buckets=16, trigger_once=True,
        )
        await_stream(q, 300)
    terms = ["spark", "table", "query", "join"]
    # collect BEFORE compacting: the search is a lazy plan over the
    # state's current files; the compactor rewrites them
    top = bm25_search_streamed(spark, pindex, terms, k=3).collect()
    print("top-3 before compaction (dedup in-plan):")
    for r in top:
        print(f"  doc {r['doc_id']}  score {r['score']}  rank {r['rank']}")
    stats = maybe_compact_streamed_postings(spark, pindex)  # due: redelivery
    print(
        f"maintenance was due; reclaimed {stats['postings_removed']} "
        f"postings + {stats['doclen_removed']} doclen redelivery copies; "
        "corpus stats rolled into the sidecar"
    )
    top2 = bm25_search_streamed(spark, pindex, terms, k=3, dedup=False)
    assert [r["doc_id"] for r in top2.collect()] == [r["doc_id"] for r in top]
    # the corpus outgrew 16 buckets? one offline rebucket resets
    # per-bucket population; searches are identical through the migration
    rb = rebucket_postings_index(spark, pindex, 32)
    top3 = bm25_search_streamed(spark, pindex, terms, k=3, dedup=False)
    assert [r["doc_id"] for r in top3.collect()] == [r["doc_id"] for r in top]
    print(
        f"rebucketed {rb['old_buckets']} -> {rb['new_buckets']} buckets; "
        "search unchanged; the old bucket count is now refused at sink start"
    )
    # deletion: tombstone the current top doc — gone from results (and
    # from df/N/avgdl) immediately; the next compaction purges physically
    # positional twin: the same corpus with store_positions=True serves
    # EXACT phrase queries (offset-shifted position-list intersection)
    from bharatmlstack_spark.streaming.ingest import (
        phrase_search_streamed,
    )

    pindex2 = f"{work}/postings_positional"
    q = stream_postings_sink(
        ptopic_stream(), pindex2, f"{work}/ck_pos", spark,
        n_buckets=16, trigger_once=True, store_positions=True,
    )
    await_stream(q, 300)
    hits = phrase_search_streamed(spark, pindex2, "order fast").collect()
    print(
        f'phrase "order fast": {len(hits)} docs, '
        f"{sum(r['n_occurrences'] for r in hits)} occurrences "
        "(positional postings)"
    )

    top_doc = top[0]["doc_id"]
    delete_postings_docs(spark, pindex, [top_doc])
    after_del = bm25_search_streamed(spark, pindex, terms, k=3).collect()
    assert all(r["doc_id"] != top_doc for r in after_del)
    purged = compact_streamed_postings(spark, pindex)
    print(
        f"deleted doc {top_doc}: out of the top-3 immediately, "
        f"{purged['purged_postings']} postings purged at compaction"
    )

    print("== 6. in-place UPDATES (versioned index) ==")
    # a VERSIONED index replaces a re-arriving doc's postings in place —
    # rows carry gen = batch id (+ a checkpoint-scoped epoch), the sink
    # probes only the batch ids' doclen buckets for older gens, and the
    # replaced generation stops scoring IMMEDIATELY, dropped terms
    # included (r13; tests/test_postings_updates.py)
    vindex = f"{work}/postings_versioned"
    vtopic = f"{work}/vtopic"
    docs.coalesce(1).write.parquet(vtopic)

    def vrun():
        q = stream_postings_sink(
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(vtopic),
            vindex, f"{work}/ck_v", spark,
            n_buckets=16, trigger_once=True, allow_updates=True,
        )
        await_stream(q, 300)

    vrun()
    vtop = bm25_search_streamed(spark, vindex, terms, k=1).collect()
    champ = vtop[0]["doc_id"]
    # re-publish the champion with text that drops every query term
    spark.createDataFrame(
        [(champ, "entirely unrelated replacement text")], doc_schema
    ).coalesce(1).write.mode("append").parquet(vtopic)
    vrun()  # same checkpoint: the update arrives as a later micro-batch
    after_upd = bm25_search_streamed(spark, vindex, terms, k=3).collect()
    assert all(r["doc_id"] != champ for r in after_upd)
    folded = fold_postings_tombstones(spark, vindex)
    print(
        f"doc {champ} re-published without the query terms: out of the "
        f"results immediately; fold purged {folded['postings_removed']} "
        "replaced postings"
    )

    # one erasure call across every state family (GDPR shape): the
    # postings index here + any near-dup/IVF/feature roots in the same
    # pipeline (purge_docs_everywhere, tests/test_purge_everywhere.py)
    report = purge_docs_everywhere(
        spark, [champ], postings_roots=[vindex], fold=True
    )
    print(
        f"purge_docs_everywhere: {report[vindex]['tombstones']} id "
        f"erased from {len(report)} root(s), folded physically"
    )

    shutil.rmtree(work, ignore_errors=True)
    print("done.")


if __name__ == "__main__":
    main()
