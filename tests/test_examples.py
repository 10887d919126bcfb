"""Smoke the example scripts end-to-end: a broken demo is a broken
front door even when every operator test passes. Each main() reuses the
session fixture's SparkSession via getOrCreate."""

import sys


def _run(module_name, spark, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [module_name, "/root/testdata/sf0.001"])
    mod = __import__(f"examples.{module_name}", fromlist=["main"])
    mod.main()
    out = capsys.readouterr().out
    assert "done." in out
    return out


def test_corpus_pipeline_demo(spark, monkeypatch, capsys):
    out = _run("corpus_pipeline_demo", spark, monkeypatch, capsys)
    assert "content-addressed shards" in out


def test_event_analytics_demo(spark, monkeypatch, capsys):
    out = _run("event_analytics_demo", spark, monkeypatch, capsys)
    assert "transition matrix" in out


def test_feature_pipeline_demo(spark, monkeypatch, capsys):
    _run("feature_pipeline_demo", spark, monkeypatch, capsys)


def test_tokenizer_demo(spark, monkeypatch, capsys):
    out = _run("tokenizer_demo", spark, monkeypatch, capsys)
    assert "chars/token" in out


def test_streaming_index_demo(spark, monkeypatch, capsys):
    out = _run("streaming_index_demo", spark, monkeypatch, capsys)
    assert "unique docs kept: 500 of 520" in out
    assert "deduped after replay" in out
    assert "stream-built IVF" in out
    # the replayed IVF topic doubled every row; the cadence policy sees
    # the redelivery (restarted batch ids) and compaction reclaims them
    assert "maintenance due (redelivery observed): compacted 495 rows" in out
    # the refit re-derives n_cells from the accumulated count (495/16)
    assert "refit 495 vectors: 8 -> 31 cells" in out
