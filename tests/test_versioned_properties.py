"""Property tests for the versioned-index dead-predicate — the ONE
semantics shared by postings searches, the IVF reader, and the folds'
detection scans (_mask_tombstoned over _postings_tombstones-normalized
waves). Hypothesis drives random interleavings of ingest batches
(re-arrivals tombstone older gens, the sinks' probe rule) and full
deletes (gen_lt = GEN_MAX, terminal until folded) through the REAL
append surface (_append_tombstones → parquet → _read_tombstones →
normalization → mask) and compares against a pure-Python latest-wins
model. A mask that leaks a replaced generation, revives a deleted doc,
or drops a live row falsifies in a few examples."""

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from bharatmlstack_spark.streaming.ingest import (
    GEN_MAX,
    _append_tombstones,
    _mask_tombstoned,
    _postings_tombstones,
)

IDS = list(range(1, 7))

# a scenario is a sequence of batches; each batch either ingests a
# distinct set of ids (the versioned sinks' one-row-per-id contract) or
# issues a full-delete wave for a set of ids
_batch = st.one_of(
    st.tuples(st.just("ingest"), st.sets(st.sampled_from(IDS), min_size=1)),
    st.tuples(st.just("delete"), st.sets(st.sampled_from(IDS), min_size=1)),
)
_scenario = st.lists(_batch, min_size=1, max_size=6)


def _model(scenario):
    """Pure-Python replay of the sink rules: rows carry (id, gen);
    a re-arrival writes an update-tombstone (id, gen_lt=gen) only when
    an OLDER gen exists (the probe rule); a delete writes
    (id, GEN_MAX). Expected live view = rows whose gen >= the id's max
    gen_lt (absent -> all gens live)."""
    rows: list[tuple[int, int]] = []
    tombs: list[tuple[int, int]] = []
    gen = 0
    for kind, ids in scenario:
        if kind == "ingest":
            present = {i for i, _ in rows}
            for i in sorted(ids):
                if i in present:
                    tombs.append((i, gen))
                rows.append((i, gen))
            gen += 1
        else:
            tombs.extend((i, GEN_MAX) for i in sorted(ids))
    gen_lt = {}
    for i, g in tombs:
        gen_lt[i] = max(gen_lt.get(i, 0), g)
    live = {(i, g) for i, g in rows if g >= gen_lt.get(i, 0)}
    return rows, tombs, live


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenario=_scenario)
def test_mask_equals_latest_wins_model(spark, tmp_path_factory, scenario):
    rows, tombs, want = _model(scenario)
    root = str(
        tmp_path_factory.mktemp("versioned_props") / uuid.uuid4().hex
    )
    data = spark.createDataFrame(rows, "id long, gen long")
    # the REAL append surface, one wave per gen boundary (multi-id waves,
    # one parquet file each) — normalization must take the max gen_lt
    # per id ACROSS files, exactly what the sinks accumulate
    waves: dict[int, list[int]] = {}
    for i, g in tombs:
        waves.setdefault(g, []).append(i)
    for g, ids in sorted(waves.items()):
        _append_tombstones(
            spark, f"{root}/tombstones", ids, T.LongType(), gen_lt=g
        )
    tomb = _postings_tombstones(spark, root)
    if tomb is None:
        got = {(r.id, r.gen) for r in data.collect()}
    else:
        got = {(r.id, r.gen) for r in _mask_tombstoned(data, tomb).collect()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenario=_scenario)
def test_delete_is_terminal_until_folded(spark, tmp_path_factory, scenario):
    """Whatever the interleaving, once an id is deleted NO generation of
    it survives the mask — including re-ingests AFTER the delete (the
    documented right-to-be-forgotten stance: the tombstone can't date
    rows; fold first, then re-ingest)."""
    rows, tombs, want = _model(scenario)
    deleted = {i for i, g in tombs if g == GEN_MAX}
    assert not {(i, g) for i, g in want if i in deleted}
    # and ids never tombstoned keep EVERY generation
    tombed = {i for i, _ in tombs}
    untouched = {(i, g) for i, g in rows if i not in tombed}
    assert untouched <= want
