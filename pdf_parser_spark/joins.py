"""Custom join operators Spark's API lacks, built as compositions of
DataFrame primitives (SURVEY.md §2.9 engine-surface extras; the graft
brief's canonical example of an operator to re-express Spark-first).

AS-OF JOIN: for every left row, attach the single most recent right
row with right.ts <= left.ts within the same key — the time-series
point-in-time lookup (market data, state reconstruction, attribution).
DuckDB/kdb have it built in; Spark does not. The scalable pattern used
here is union + tagged ordering + last-non-null window:

1. union the two sides with a side tag (right=0, left=1);
2. one window per key ordered by (ts, side): ``last(right_cols,
   ignorenulls=True)`` over unbounded-preceding..current carries the
   latest right values forward (right sorts before left on ts ties, so
   the match is inclusive, matching ASOF's <=);
3. keep only left rows.

Cost: ONE shuffle of left+right on the key — same asymptotics as a
regular join, with none of the range-join quadratic blowup. Skewed
keys: salt the key and replicate right rows per salt (not done here;
events keys are uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """RANGE JOIN (point-in-interval) without the nested-loop trap:
    Spark compiles a plain ``p.ts >= i.start AND p.ts < i.end``
    condition to BroadcastNestedLoopJoin (quadratic). The scalable
    pattern: explode each interval into the coarse time buckets it
    covers, bucket each point, equi-join on (key, bucket) — a hash
    join — then apply the exact range filter to the surviving
    candidates. Bucket width trades replication factor (intervals span
    len/bucket_seconds buckets) against candidate precision; with
    day buckets a 3-day interval replicates 3-4x, nothing quadratic.

    Both inputs need the ``on`` key; intervals are [start, end).
    Returns points x matching intervals (inner)."""
    ibuckets = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start) / bucket_seconds).cast("long"),
                F.floor((F.unix_timestamp(end) - 1) / bucket_seconds).cast("long"),
            )
        ),
    )
    pbuckets = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(point_ts) / bucket_seconds).cast("long")
    )
    return (
        pbuckets.join(ibuckets, [on, "_bucket"])
        .filter((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_prefix: str = "prior_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``right_prefix``-named
    copies of the right side's non-key columns from the most recent
    right row with ``right.ts <= left.ts`` on the same ``on`` key
    (NULLs when no prior right row exists).

    ``right`` must be unique per (on, ts) — dedupe upstream, otherwise
    which duplicate wins is tie-order-dependent in any engine.
    """
    r_cols = [c for c in right.columns if c not in (on, ts)]
    tagged_r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols],
        F.col(ts).alias(f"{right_prefix}{ts}"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns if c not in (on, ts)],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}") for c in r_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{right_prefix}{ts}"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in (on, ts)],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = Window.partitionBy(on).orderBy(ts, "_side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.select(
        on,
        ts,
        "_side",
        *[F.col(f"_l_{c}") for c in left.columns if c not in (on, ts)],
        *[
            F.last(f"{right_prefix}{c}", ignorenulls=True).over(w).alias(f"{right_prefix}{c}")
            for c in r_cols + [ts]
        ],
    )
    out_left = [F.col(f"_l_{c}").alias(c) for c in left.columns if c not in (on, ts)]
    return carried.filter(F.col("_side") == 1).select(
        on, ts, *out_left, *[f"{right_prefix}{c}" for c in r_cols + [ts]]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """SKEW-SALTED inner equi-join: defuses a hot join key by
    splitting each key's left rows across ``n_salts`` sub-keys and
    replicating the right side once per salt, so the shuffle spreads a
    hot key over n_salts reducers instead of hanging the stage on one
    straggler task.

    - left gains ``_salt = pmod(hash(all left columns), n_salts)`` —
      deterministic but effectively uniform per row; the salt value
      never affects the join RESULT, only row placement;
    - right is exploded n_salts× (its total replicated size must stay
      << the left side — the technique targets big-left × medium-right
      where the right is too large to broadcast but cheap to
      replicate a few times);
    - equi-join on (key, _salt) — a plain hash join whose build rows
      per reducer are right/n_salts-sharded copies.

    AQE's skewedJoin covers sort-merge skew automatically at runtime;
    explicit salting remains the portable fix when AQE can't split
    (e.g. a single key bigger than any split threshold, or
    aggregation-feeding windows downstream). Result is identical to
    ``left.join(right, on)``.
    """
    # Collision-free temp column: a caller-owned "_salt" column must
    # survive untouched, so pick a name present in neither schema.
    salt = "_salt"
    taken = set(left.columns) | set(right.columns)
    while salt in taken:
        salt = "_" + salt
    # Hash only hashable column types: F.hash raises at analysis time
    # for MapType, and VariantType is similarly unhashable — including
    # when nested inside an array or struct, so the check walks the
    # full type tree. A real type walk, not a simpleString() substring
    # match: simpleString renders FIELD NAMES too, so a struct field
    # merely named "variant_id" must not disqualify its column. The
    # salt only needs per-row spread, not full-row identity, so
    # dropping unhashable columns from the hash input is semantics-free.
    from pyspark.sql import types as T

    def _hashable(dt) -> bool:
        if isinstance(dt, T.MapType) or dt.typeName() == "variant":
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    hash_cols = [f.name for f in left.schema.fields if _hashable(f.dataType)]
    if not hash_cols:
        raise ValueError("salted_join: left side has no hashable columns to salt on")
    salted_l = left.withColumn(
        salt, F.pmod(F.hash(*[F.col(c) for c in hash_cols]), F.lit(n_salts))
    )
    salted_r = right.withColumn(
        salt, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_l.join(salted_r, [on, salt], "inner").drop(salt)


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_bits: int = 1 << 13,
    n_hashes: int = 2,
) -> DataFrame:
    """Semi-join ``left`` to ``right`` through a hand-built Bloom-filter
    runtime prefilter: rows of ``left`` are first screened against a
    bit-set built from ``right``'s keys, and only the
    survivors reach the exact semi-join. The RESULT is exactly
    ``left.join(right, left[left_key] == right[right_key], "left_semi")``
    — the Bloom stage admits false positives (removed by the exact
    join) and never false negatives (every true key sets its own bits)
    — so the plain semi-join is the oracle, same contract as
    ``salted_join``.

    Why it matters at 100 TB: a shuffle semi-join moves EVERY left row
    to a reducer keyed on ``left_key`` before any row can be rejected.
    The Bloom prefilter rejects most non-matching rows AT THE SCAN,
    before the exchange, for the price of one bounded aggregation over
    the build side — the same row-level runtime filter
    Spark's own AQE injects when
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` fires (this
    operator is the explicit, plannable form; the built-in one only
    triggers under selectivity/size heuristics it cannot be forced
    through). With the default 8192 bits and 2 probes, a 1k-key build
    side yields ~1.5% false positives; the exchange then carries ~1.5%
    of the non-matching rows instead of 100% of them.

    Shape (mirrors Spark's own ``BloomFilterAggregate`` + injected
    scan filter): ONE aggregation pass over ``right`` ORs the probe
    bits into ``n_bits / 64`` longs; that bitmap — bounded at
    ``n_bits`` BITS (1 KiB at the default) no matter how large the
    build side is, unlike the key set itself — is collected and
    embedded as a literal array, so the probe is a pure whole-stage-
    codegen expression on the left scan with NO join, NO exchange, and
    no recomputation of the build side per probe. When the build side
    saturates the bitmap every bit is set and the filter degrades
    gracefully to a no-op rather than an OOM. Size ``n_bits`` at
    ~10 bits per expected distinct build key for ~1% false positives.
    """
    cand = bloom_prefilter(left, right, left_key, right_key, n_bits, n_hashes)
    # Exact stage: no broadcast hint — the build side's size scales
    # with the corpus, AQE picks broadcast vs shuffle from measurement.
    return cand.join(
        right.select(right_key).distinct(),
        F.col(left_key) == F.col(right_key),
        "left_semi",
    )


def bloom_prefilter(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_bits: int = 1 << 13,
    n_hashes: int = 2,
) -> DataFrame:
    """The screening stage of :func:`bloom_semi_join`, exposed so the
    candidate set (true matches + Bloom false positives, never a false
    negative) is testable and reusable as a standalone scan filter."""
    if n_hashes < 1:
        raise ValueError("bloom_prefilter: n_hashes must be >= 1")
    if n_bits < 1:
        raise ValueError("bloom_prefilter: n_bits must be >= 1")
    n_words = (n_bits + 63) // 64

    # Build: one explode + one bounded aggregate (<= n_words rows leave
    # the map side); the collect is of a fixed-size bitmap, not data.
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(right_key), F.lit(seed)), F.lit(n_bits)).cast(
                "long"
            )
            for seed in range(n_hashes)
        ]
    )
    words = (
        right.select(F.explode(probes).alias("_bit"))
        .groupBy(F.expr("CAST(_bit div 64 AS INT)").alias("_w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_bit % 64 AS INT)))"
            ).alias("_mask")
        )
        .collect()
    )
    bitmap = [0] * n_words
    for row in words:
        bitmap[row["_w"]] = row["_mask"]
    arr_sql = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"

    def member_sql(seed: int) -> str:
        b = f"pmod(xxhash64(`{left_key}`, {seed}), {n_bits})"
        return (
            f"(shiftrightunsigned(element_at({arr_sql}, "
            f"CAST({b} div 64 AS INT) + 1), CAST({b} % 64 AS INT)) & 1) = 1"
        )

    return left.filter(
        F.expr(" AND ".join(member_sql(seed) for seed in range(n_hashes)))
    )
