"""Guard against re-introducing inline events.parquet ts decoding.

The driver's testdata has shipped ``events.parquet``'s ``ts`` as both
int64-nanos and parquet timestamp[us]; the ONLY place allowed to know
about that is ``sources/events.py``. Round 3 lost its bench + 4
correctness rows to call sites that kept an inline ``ts div 1000000``
after the encoding flipped — this test fails on any regression.
"""

import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
ALLOWED = REPO / "bharatmlstack_spark" / "sources" / "events.py"


def _py_files():
    for sub in ("bharatmlstack_spark", "tests", "tools", "examples"):
        root = REPO / sub
        if root.exists():
            yield from root.rglob("*.py")
    yield REPO / "bench.py"
    yield REPO / "__spark_entry__.py"


def test_no_inline_ts_decoding_outside_events_loader():
    offenders = []
    for path in _py_files():
        if path == ALLOWED or path.name == "test_ts_migration_guard.py":
            continue
        text = path.read_text(encoding="utf-8", errors="replace")
        if "ts div 1000000" in text:
            offenders.append(str(path))
    assert not offenders, (
        f"inline 'ts div 1000000' found outside sources/events.py: {offenders} "
        "— use load_events_ms/load_events_ts instead"
    )


def test_no_inline_events_parquet_reads():
    import re

    # matches even when the call is wrapped across lines and when the
    # argument itself contains nested calls (os.path.join(...), f-string
    # format specs): [^()]* would stop at the inner parens, so allow one
    # level of nesting explicitly. The optional trailing .count() group
    # marks the one allowed warm-up idiom, exempted per match (not per
    # file) so it cannot mask a real offending read.
    inner = r"(?:[^()]|\([^()]*\))*"
    pat = re.compile(
        r"read\.parquet\(" + inner + r"events\.parquet" + inner + r"\)(\.count\(\))?",
        re.S,
    )
    offenders = []
    for path in _py_files():
        if path == ALLOWED or path.name == "test_ts_migration_guard.py":
            continue
        text = path.read_text(encoding="utf-8", errors="replace")
        for m in pat.finditer(text):
            if m.group(1):
                continue
            offenders.append(f"{path}:{text.count(chr(10), 0, m.start()) + 1}")
    assert not offenders, (
        f"direct spark.read.parquet of events.parquet outside the loader: "
        f"{offenders} — use sources.events loaders so encoding dispatch "
        "stays centralized"
    )


def test_bigint_ts_outside_ns_range_fails_loudly(spark, tmp_path):
    """A third ts encoding (e.g. µs-as-long) must raise, not silently be
    divided as if it were nanoseconds."""
    import pytest

    from bharatmlstack_spark.sources import events as EV

    sf = str(tmp_path / "sfbad")
    # µs-magnitude int64: 2024-01-01 in MICROseconds (1000x below ns range)
    spark.range(1).selectExpr(
        "id AS event_id", "CAST(1704067200000000 AS LONG) AS ts",
        "id AS user_id", "'click' AS event_type", "1.0 AS value", "'{}' AS props",
    ).write.parquet(f"{sf}/events.parquet")
    if dict(EV.load_events_raw(spark, sf).dtypes)["ts"] != "bigint":
        pytest.skip("parquet long did not read back as bigint under this conf")
    with pytest.raises(ValueError, match="nanosecond epoch"):
        EV.load_events_ms(spark, sf)
