"""Deterministic sampling operators for training-set construction.

All sampling here is hash-based, never ``rand()``: a row's fate is a pure
function of its key, so samples are reproducible across runs, engines, and
partitionings — the property a 100 TB pipeline needs for resumable /
auditable dataset builds (and the property that makes every operator
DuckDB-oracle-checkable).

Multiplicative hashing (Knuth's 2654435761 over a modulus) is engine-
portable integer arithmetic — identical in Spark and any SQL oracle,
unlike xxhash64/md5-based fractions which differ per engine.

Scale notes:
- ``mix_sample`` is a scan-level filter — no shuffle, fully pushdown-able.
- ``negative_sample`` bounds the candidate cross product by subsampling
  users and the item pool FIRST (both hash-filters), so the expansion is
  |users_kept| x |item_pool|, then one anti-join against observed
  interactions and one per-user top-k window. The interactions side — the
  100 TB side — is touched once, projected to the two key columns.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 * golden-ratio conjugate; engine-portable int mix
MIX_LOW = 1 << 20  # low-bits window of the int64-safe mix
MIX_HI = 40503  # 16-bit Knuth constant folds the high bits back in


def knuth_mix(key: Column | str) -> Column:
    """Full-entropy multiplicative mix that CANNOT overflow int64:
    ``(x % 2^20) * KNUTH + (x >> 20) * 40503`` — max ~2^52 + 2^59 < 2^63,
    exact BIGINT arithmetic on every engine at every NONNEGATIVE id.
    Equal to the raw ``x * KNUTH`` for x < 2^20 (every test-fixture id),
    while the raw product overflows for x >= ~3.5e9, where Spark wraps
    silently but DuckDB promotes to HUGEINT — the arithmetic-divergence
    family tests/test_oracle_types.py lints registry-wide. The SQL twin
    is ``(x % 1048576) * 2654435761 + (x // 1048576) * 40503``.

    PRECONDITION: keys must be >= 0 (true of every id column here). For
    negative keys the two forms disagree: Spark's ``shiftright`` is an
    arithmetic shift (floors toward -inf) while DuckDB's ``//``
    truncates toward zero — e.g. x=-1 gives high=-1 vs high=0. A
    negative-id feed must be shifted into the nonnegative range first."""
    c = F.col(key) if isinstance(key, str) else key
    c = c.cast("bigint")
    return (c % F.lit(MIX_LOW)) * F.lit(KNUTH) + F.shiftright(c, 20) * F.lit(MIX_HI)


def knuth_mix_sql(col: str) -> str:
    """DuckDB twin of knuth_mix — paste into oracle SQL."""
    return f"(({col} % 1048576) * 2654435761 + ({col} // 1048576) * 40503)"


def hash_fraction(key: Column | str, modulus: int = 10000) -> Column:
    """Deterministic pseudo-uniform value in [0, modulus) from an integer
    key. Pure int arithmetic -> identical in Spark / DuckDB / anything."""
    return knuth_mix(key) % F.lit(modulus)


def mix_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Corpus mixing: keep each row with a per-stratum rate (e.g. domain /
    language re-weighting when assembling a training mix).

    Deterministic per id — re-running at a higher rate yields a superset
    (nested samples), which is what incremental corpus scaling wants.
    """
    frac = hash_fraction(id_col)
    rate_expr: Column = F.lit(default_rate)
    for value, rate in rates.items():
        rate_expr = F.when(F.col(strata_col) == value, F.lit(rate)).otherwise(rate_expr)
    return df.filter(frac < rate_expr * 10000)


def negative_sample(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    users: DataFrame,
    items: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Per-user hash-ranked negative sampling: for every user in ``users``,
    the ``k`` items from ``items`` the user did NOT interact with, chosen
    by a deterministic per-(user, item) hash order.

    Mirrors the reference's implicit-feedback training shape (interaction
    store supplies positives; negatives are synthesized) —
    interaction-store/pkg/proto/time_series.proto:16-34 defines the
    positive events; sampling is our engine extension.

    ``users`` x ``items`` must be pre-bounded by the caller (hash-filter
    subsets); the item pool folds to ONE in-row array (the bound the old
    broadcast cross join already required). The same goes for
    ``interactions``: only pairs inside users x items can ever eliminate
    a candidate, so the caller should apply the pool predicates AT THE
    SCANS (as queries_corpus.negative_sampling does) — the per-user
    positives aggregate then shrinks by the product of the two sampling
    rates instead of paying the full fact table.

    Shape (guide §2.3 "aggregate before you shuffle", §1.2): the old
    form materialized the |users| x |items| candidate cross product,
    shuffled IT through a (user, item) anti-join, then re-shuffled it
    through a per-user row_number window. Only |pos| rows ever needed to
    move: positives aggregate to one set per user (collect_set folds the
    old ``distinct`` into the same exchange), join the user pool on
    user, and the anti-join + hash-rank + top-k run IN-ROW over the
    pooled item array (array_except + array_sort + slice) — candidate
    pairs are born ranked inside their row and never cross the network.
    Exchanges 14 -> 10, Window nodes 6 -> 0 on the registered caller
    (plans/r17/negative_sampling_{before,after}.txt); values are
    identical — same int64-safe mix, same (score, item) tie order
    (array_sort on a (s, item) struct = the window's ORDER BY), pinned
    by the DuckDB oracle and tests/test_corpus_ops.py.
    """
    u = users.select(F.col(user_col).cast("bigint").alias(user_col)).distinct()
    i = items.select(F.col(item_col).cast("bigint").alias(item_col)).distinct()
    # ONE row: the sorted item pool as an in-row array (pre-bounded by
    # contract — this is the same bound the broadcast cross join imposed)
    pool = i.agg(F.array_sort(F.collect_set(item_col)).alias("__pool"))
    # one exchange on user: the per-user positive set (collect_set
    # subsumes the old pos.distinct() — duplicates die in the aggregate)
    pos_sets = (
        interactions.select(
            F.col(user_col).cast("bigint").alias(user_col),
            F.col(item_col).cast("bigint").alias(item_col),
        )
        .groupBy(user_col)
        .agg(F.collect_set(item_col).alias("__pos"))
    )
    # per-(user, item) mix in the same int64-safe form as knuth_mix —
    # the raw user*1000003 + item*KNUTH wraps for item >= ~3.5e9
    u_c = F.col(user_col).cast("bigint")

    def score(i_c: Column) -> Column:
        return (
            (u_c % F.lit(MIX_LOW)) * F.lit(1000003)
            + F.shiftright(u_c, 20) * F.lit(7919)
            + (i_c % F.lit(MIX_LOW)) * F.lit(KNUTH)
            + F.shiftright(i_c, 20) * F.lit(MIX_HI)
        ) % F.lit(999999937)

    negs = F.array_except(F.col("__pool"), F.coalesce(F.col("__pos"), F.array()))
    ranked = F.array_sort(
        F.transform(negs, lambda x: F.struct(score(x).alias("s"), x.alias("i")))
    )
    return (
        u.crossJoin(F.broadcast(pool))
        .join(pos_sets, on=user_col, how="left")
        .select(
            user_col,
            F.explode(F.slice(ranked, 1, k)).alias("__top"),
        )
        .select(user_col, F.col("__top.i").alias(item_col))
    )
