"""Deterministic probabilistic sketches: HyperLogLog distinct-count,
Count-Min frequency, Bloom-filter join pruning.

At 100 TB the exact forms of these queries are the expensive ones: exact
COUNT(DISTINCT) shuffles every key, exact heavy-hitters shuffles every
token, and a join against a small dimension still scans + shuffles the
full fact side.  Each sketch here replaces that with a *bounded-size*
state (256 registers, d×w counters, m bits) built in one pass with
ordinary partial/final aggregation — the classic sketch property that
partial sketches merge associatively, which is exactly what Spark's
two-phase HashAggregate needs.

Engine-portability design: every hash is derived from ``md5`` hex (the
one hash primitive that is bit-identical across Spark, DuckDB, and every
other engine), and every estimator is computed with exact integer /
decimal arithmetic up to a single final float op, so an independent SQL
engine reproduces the sketch *bit-for-bit* — the estimates themselves
are value-oracle-checkable, not just "approximately right".

Reference scope note: the reference (vptstools) has no sketch operators;
these are engine extensions motivated by its inventory/coverage use case
(`vptstools/s3.py` coverage counting) where approximate distinct counts
over object listings are the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), m = 2^p registers, md5-derived hash.
# ---------------------------------------------------------------------------

#: register-count exponent: m = 256 registers → ~6.5% standard error
HLL_P = 8
HLL_M = 1 << HLL_P

#: bias-correction constant α_m for m ≥ 128 (HLL paper, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

#: hex digits of md5 used for the rank ("rho") tail: 15 nibbles = 60 bits,
#: so rho ∈ [1, 61] and 2^(61-rho) stays inside DECIMAL(38,0) when summed
#: over 256 registers (≤ 256·2^60 < 10^21).
_TAIL_NIBBLES = 15
_RHO_MAX = 4 * _TAIL_NIBBLES + 1  # 61


def _hex_to_long(col: Column) -> Column:
    """Hex string → non-negative bigint (≤ 60 bits in, so no sign issues)."""
    return F.conv(col, 16, 10).cast("long")


def hll_rho(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one key: bucket = first 2 md5 nibbles (0..255),
    rho = 1 + number of leading zero *bits* of the next 60 bits.

    The leading-zero count is computed exactly via string arithmetic on the
    hex tail (strip leading '0' nibbles, then CASE on the first non-zero
    nibble) — no floating log2, so it is bit-identical in any engine with
    md5 + regexp_replace.
    """
    h = F.md5(key.cast("string"))
    bucket = _hex_to_long(F.substring(h, 1, 2))
    tail = F.substring(h, 3, _TAIL_NIBBLES)
    stripped = F.regexp_replace(tail, "^0+", "")
    lz_nibbles = F.lit(_TAIL_NIBBLES) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    # extra leading zero bits inside the first non-zero nibble
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = (
        F.when(stripped == "", F.lit(_RHO_MAX))
        .otherwise(lz_nibbles * 4 + extra + 1)
        .cast("int")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame, key: Column, group_cols: list[str]
) -> DataFrame:
    """One pass over `df`: per group, the 256-register HLL state
    (bucket, M = max rho). Partial maxes combine map-side, so the shuffle
    carries at most |groups|·256 rows no matter how many input rows."""
    bucket, rho = hll_rho(key)
    return (
        df.select(*group_cols, bucket.alias("__bucket"), rho.alias("__rho"))
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__rho").alias("__m"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers → per-group estimate, exact-arithmetic form.

    The harmonic sum Σ 2^-M is scaled by 2^61 so every term is an exact
    integer (powers of two are exact doubles; the decimal cast keeps the
    sum exact and order-independent — a plain double sum would make the
    estimate depend on aggregation order and break value-oracle equality).
    V empty registers each contribute 2^0 = 1 → V·2^61 scaled.
    Small-range correction (E ≤ 2.5m, V > 0): linear counting m·ln(m/V).
    """
    scaled_term = F.pow(F.lit(2.0), F.lit(_RHO_MAX) - F.col("__m")).cast(
        "decimal(38,0)"
    )
    # coalesce: a global aggregate over an EMPTY register table still emits
    # one row (sum = null); 0 harmonic mass + V = m flows through the
    # linear-counting branch to the mathematically correct estimate of 0
    agg = registers.groupBy(*group_cols).agg(
        F.coalesce(F.sum(scaled_term), F.lit(0).cast("decimal(38,0)")).alias("__s"),
        F.count("*").alias("__nonzero"),
    )
    v = F.lit(HLL_M) - F.col("__nonzero")
    scale = float(2.0**_RHO_MAX)
    s_total = (
        F.col("__s") + v.cast("decimal(38,0)") * F.lit(scale).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * scale) / s_total
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est, 3).alias("hll_est"),
        v.cast("int").alias("zero_registers"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cm_bucket(key: Column, row: Column | int, width: int) -> Column:
    """Row-salted md5 bucket in [0, width): row j uses salt 'cm<j>:'."""
    r = F.lit(row) if isinstance(row, int) else row
    h = F.md5(F.concat(F.lit("cm"), r.cast("string"), F.lit(":"), key.cast("string")))
    return _hex_to_long(F.substring(h, 1, 8)) % width


def cm_sketch(
    df: DataFrame, key: Column, depth: int = 3, width: int = 128
) -> DataFrame:
    """d×w counter table from one pass: each key lands in one bucket per
    row. State is d·w counters regardless of input size; the explode is
    ×d (small constant), and partial counts combine map-side."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row")
    return (
        df.select(key.alias("__key"), rows)
        .select("__row", cm_bucket(F.col("__key"), F.col("__row"), width).alias("__bucket"))
        .groupBy("__row", "__bucket")
        .agg(F.count("*").alias("__cnt"))
    )


def cm_estimate(
    sketch: DataFrame, candidates: DataFrame, key_col: str, depth: int = 3, width: int = 128
) -> DataFrame:
    """Point-query the sketch for each candidate key: min over the d row
    counters (the CM upper-bound estimate, exact integers → oracle-safe).
    The sketch is tiny (d·w rows) so it broadcasts onto the candidates."""
    probes = candidates.select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row"),
    ).withColumn("__bucket", cm_bucket(F.col(key_col), F.col("__row"), width))
    return (
        probes.join(F.broadcast(sketch), ["__row", "__bucket"])
        .groupBy(key_col)
        .agg(F.min("__cnt").alias("cm_est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter join pruning
# ---------------------------------------------------------------------------


def bloom_positions(
    key: Column, n_hashes: int, m_bits: int, family: str = "md5"
) -> list[Column]:
    """k bit positions per key, each from an independently-salted hash.

    Two families (r9, guide §4/§2.3 — cheapest hash that serves the
    consumer):
    - ``"md5"`` (default): salted md5 over the stringified key. Kept for
      the file-bloom index (`plans/skipping.py`), whose point probes are
      evaluated DRIVER-side by a Python twin (`_bloom_positions_driver`)
      — md5 is bit-reproducible in hashlib; Spark's xxhash64 is not
      worth reimplementing.
    - ``"xxh64"``: salted xxhash64 on the NATIVE key type — no string
      cast, no digest slice, whole-stage-codegen'd. The fact-scan
      prefilter path (`sketch_q.q_sketch_bloom_join`) uses this: the
      probe runs once per fact row, where two salted md5s measured
      ~0.9 s of the 1.2 s scan at sf0.1. Build and probe must pass the
      SAME family — a mask is meaningless under the other hash.
    Either family yields a correct Bloom filter (false positives are
    removed by the exact join that follows; false negatives are
    impossible within a family), so results are hash-agnostic.
    """
    if family == "xxh64":
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
            for i in range(n_hashes)
        ]
    return [
        _hex_to_long(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 8
            )
        )
        % m_bits
        for i in range(n_hashes)
    ]


def bloom_build(
    dim: DataFrame,
    key: Column,
    n_hashes: int = 2,
    m_bits: int = 1024,
    family: str = "md5",
) -> list[int]:
    """Build the filter as `m_bits/64` longs. The only driver data is the
    bitmask itself (m_bits/8 bytes — model-sized by construction, never
    proportional to the dimension's row count: the distinct-positions agg
    collapses to ≤ m_bits rows before collect)."""
    pos_col = F.explode(F.array(*bloom_positions(key, n_hashes, m_bits, family)))
    positions = [
        r[0] for r in dim.select(pos_col.alias("p")).distinct().collect()
    ]
    words = [0] * (m_bits // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement: bit 63 set would overflow a signed literal long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, mask: list[int], n_hashes: int = 2, family: str = "md5"
) -> Column:
    """Membership test against a literal mask: k bit probes, all JVM-side
    (array literal + element_at + shiftright) — no Python, no join, so it
    pushes into the fact-side scan stage as a cheap prefilter."""
    m_bits = len(mask) * 64
    # explicit long cast: a mask whose words all fit in 32 bits would
    # otherwise become array<int> and getbit would reject positions ≥ 32
    mask_lit = F.array(*[F.lit(w).cast("long") for w in mask])
    cond = F.lit(True)
    for pos in bloom_positions(key, n_hashes, m_bits, family):
        word = F.element_at(mask_lit, (pos / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, pos % 64) == 1)
    return cond


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge partial HLL register tables (max per bucket) — the property
    that makes the sketch a storable rollup: persist per-partition
    registers once, then answer distinct-count queries over ANY partition
    subset by merging 256-row states, never rescanning the data. Output
    feeds `hll_estimate` unchanged."""
    return registers.groupBy(*group_cols, "__bucket").agg(
        F.max("__m").alias("__m")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch — distinct counts AND set-overlap estimates
# ---------------------------------------------------------------------------

#: md5 nibbles for the KMV hash: 12 nibbles = 48 bits, exact in a long and
#: in the doubles of any engine (< 2^53)
_KMV_NIBBLES = 12
KMV_HASH_SPACE = 1 << (4 * _KMV_NIBBLES)


def kmv_hash(key: Column) -> Column:
    return _hex_to_long(F.substring(F.md5(key.cast("string")), 1, _KMV_NIBBLES))


def kmv_sketch(
    df: DataFrame,
    key: Column,
    k: int,
    group_cols: list[str] | None = None,
    prehashed: bool = False,
) -> DataFrame:
    """Per group, the k smallest distinct md5 hash values of `key` —
    one (group, h) row each. The classic bottom-k sketch: mergeable by
    union + re-take-k, supports distinct-count AND set-intersection
    estimates (what HLL cannot do). The distinct collapse happens first
    (hash shuffle), so the per-group rank sort runs over distinct hashes
    only; state is ≤ k rows per group."""
    from pyspark.sql import Window

    gc = group_cols or []
    # prehashed: the column already holds kmv_hash values (merging sketches)
    # — re-hashing them would build a sketch of a DIFFERENT key space
    h = (key if prehashed else kmv_hash(key)).alias("h")
    distinct = df.select(*gc, h).distinct()
    if not gc:
        # global sketch: TakeOrderedAndProject (distributed bounded top-k),
        # never a single-partition window over all distinct hashes
        return distinct.orderBy("h").limit(k)
    w = Window.partitionBy(*gc).orderBy("h")
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(sketches: DataFrame, k: int, group_cols: list[str] | None = None) -> DataFrame:
    """Union of KMV sketches → valid KMV sketch of the united key sets:
    distinct hashes, re-take the k smallest. The hashes pass through
    verbatim (prehashed) — bottom-k of a union of bottom-ks equals
    bottom-k of the union."""
    return kmv_sketch(sketches, F.col("h"), k, group_cols, prehashed=True)


def kmv_distinct_estimate(sketch: DataFrame, k: int, group_cols: list[str] | None = None) -> DataFrame:
    """(k-1) · H / h_k when the sketch is full (h_k = the kth smallest
    hash, H = hash-space size); exact size (row count) when fewer than k
    distinct values exist — integer inputs, one final division."""
    gc = group_cols or []
    agg = sketch.groupBy(*gc).agg(
        F.count("*").alias("__n"), F.max("h").alias("__hk")
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_HASH_SPACE)) / F.col("__hk").cast("double")
    )
    return agg.select(*gc, F.round(est, 3).alias("kmv_est"))


# ----------------------------------------------------------------- moments

#: Mergeable moments sketch (public design: Gan, Ding, Tai, Sharan, Bailis
#: — "Moment-Based Quantile Sketches for Efficient High Cardinality
#: Aggregation Queries", VLDB 2018): per group keep (n, min, max, Σx,
#: Σx², …, Σx^k). Every field is a plain commutative aggregate, so the
#: sketch costs ONE map-side-combinable hash aggregation to build, O(k)
#: state per group, and merging sketches is summing them — the same
#: rollup-identity contract as the HLL registers in this module, but for
#: distribution shape instead of cardinality. This implementation scopes
#: the estimator to EXACT moment algebra (mean/variance/skewness/kurtosis
#: via central-moment expansion) rather than the paper's maximum-entropy
#: quantile solver: the moments themselves are the mergeable artifact;
#: estimation is driver-free column arithmetic.
#:
#: Exactness contract: the value column is cast to BIGINT (integer-valued
#: measures), so power sums are exact integer arithmetic — merge-then-
#: estimate is bit-identical to direct estimation, provable by a value
#: oracle, with the documented overflow bound |x|^k · n < 2^63 (e.g.
#: quantities ≤ 50 at k=4 stay exact beyond 10^12 rows).


def moments_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 4,
) -> DataFrame:
    """(group_cols…, n, mn, mx, s1..sk) — one hash aggregation."""
    x = F.col(value_col).cast("long")
    powers = []
    p = x
    for i in range(1, k + 1):
        powers.append(F.sum(p).alias(f"s{i}"))
        p = p * x
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        *powers,
    )


def moments_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 4
) -> DataFrame:
    """Merge sketches down to a coarser grouping: sums add, extrema
    combine — Σ over a partition of the data IS Σ over the data, so the
    merged sketch is exactly the sketch of the union."""
    return sketches.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        *[F.sum(f"s{i}").alias(f"s{i}") for i in range(1, k + 1)],
    )


def moments_stats(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Population mean/variance/skewness/kurtosis-excess from a k≥4
    sketch, via the central-moment expansion of raw power sums. The
    expression tree is written in ONE fixed association order and
    mirrored verbatim in SQL oracles — the only floating-point ops are
    the final divisions/powers over exact integer sums."""
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m
    m4 = (
        s4 / n
        - F.lit(4.0) * m * (s3 / n)
        + F.lit(6.0) * m * m * (s2 / n)
        - F.lit(3.0) * m * m * m * m
    )
    return sketch.select(
        *group_cols,
        "n",
        "mn",
        "mx",
        F.round(m, 6).alias("mean"),
        F.round(m2, 6).alias("variance"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurtosis_excess"),
    )


# ---------------------------------------------------------------- quantiles

#: Mergeable quantile histogram (public design family: HdrHistogram /
#: DDSketch, Masson-Lee-Khanna VLDB 2019 — log-bucketed counts with a
#: bounded RELATIVE error, mergeable by adding counts). This variant is
#: INTEGER-EXACT so two engines bucket identically: for a positive
#: integer measure x with e = floor(log2 x) (computed as
#: length(bin(x)) - 1 — pure string/integer ops, no floating log) and
#: `sub_bits` = b sub-bucket bits,
#:
#:     idx(x) = x                               for x < 2^(b+1)
#:            = (e - b) * 2^b + (x >> (e - b))  otherwise
#:
#: i.e. exact buckets below 2^(b+1), then 2^b buckets per octave keyed by
#: the top b+1 bits — continuous at the seam (e = b gives idx = x). The
#: bucket's LOWER BOUND is reported as the quantile estimate, so the
#: relative error is < 2^-b one-sided (never overestimates). Zero gets
#: bucket 0. Everything is a plain count per (group, idx): building is
#: ONE map-side-combinable aggregation, state per group is at most
#: 2^(b+1) + b·2^b + 64·2^b buckets (≈ a few KB), and merging sketches —
#: across partitions, shards, or rollup levels — is summing counts, the
#: same rollup-identity contract as the HLL/moments sketches above. The
#: quantile rule is the deterministic lower discrete quantile: the value
#: at cumulative rank ceil(q·n), which the SQL oracle reproduces verbatim
#: (no interpolation, no floating bucket boundaries).


def qhist_bucket(value: Column, sub_bits: int = 4) -> Column:
    """Bucket index of a non-negative BIGINT value — codegen'd integer
    ops only (bin-length exponent, shifts), portable across engines."""
    x = value.cast("long")
    e = (F.length(F.bin(x)) - F.lit(1)).cast("int")
    sub = 1 << sub_bits
    coarse = (
        (e - F.lit(sub_bits)).cast("long") * F.lit(sub)
        + F.call_function("shiftright", x, e - F.lit(sub_bits))
    )
    return F.when(x < F.lit(2 * sub), x).otherwise(coarse)


def qhist_lower_bound(idx: Column, sub_bits: int = 4) -> Column:
    """Inverse of `qhist_bucket`: the smallest value in the bucket."""
    sub = 1 << sub_bits
    k = (idx / F.lit(sub)).cast("long")  # = (e - b) + 1 in the coarse zone
    m = idx - (k - F.lit(1)) * F.lit(sub)
    return F.when(idx < F.lit(2 * sub), idx).otherwise(
        F.call_function("shiftleft", m, (k - F.lit(1)).cast("int"))
    )


def qhist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 4,
) -> DataFrame:
    """(group_cols…, idx, cnt) — one hash aggregation over the data; the
    value column must be a non-negative integer measure (scale decimals
    to integer units first, e.g. money → cents)."""
    return (
        df.select(
            *group_cols,
            qhist_bucket(F.col(value_col), sub_bits).alias("idx"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.count("*").alias("cnt"))
    )


def qhist_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches to a coarser grouping: counts add — the histogram
    of a union is the sum of histograms, exactly."""
    return sketches.groupBy(*group_cols, "idx").agg(
        F.sum("cnt").alias("cnt")
    )


def qhist_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    sub_bits: int = 4,
) -> DataFrame:
    """Per-group quantile estimates from a sketch: for each q, the lower
    bound of the bucket holding cumulative rank ceil(q·n). The window
    input is BUCKET COUNTS (≤ a few thousand rows per group by
    construction), never the data — safe at any data scale. Output:
    (group_cols…, n, q_<q> …) with q columns named like q_50/q_99."""
    if not group_cols:
        # ungrouped: the cum window is GLOBAL. Its input is structurally
        # bounded — the bucket-index domain for 63-bit values is
        # (63 - sub_bits) · 2^sub_bits + 2^(sub_bits+1) buckets — but
        # Catalyst can't see that, so state the bound as a Limit that can
        # never bind. This keeps the no-global-window plan audit honest:
        # the gather the window pays is provably ≤ the bucket domain,
        # never the data.
        bucket_domain = (63 - sub_bits) * (1 << sub_bits) + (1 << (sub_bits + 1))
        sketch = sketch.limit(bucket_domain)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(
        *group_cols,
        "idx",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        name = f"q_{str(q).replace('0.', '').rstrip('0') or '0'}"
        rank = F.ceil(F.lit(q) * F.col("n"))
        hit = F.when(F.col("cum") >= rank, F.col("idx"))
        aggs.append(
            qhist_lower_bound(F.min(hit), sub_bits).alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# Exact-distinct bitmaps (Spark's bitmap_* builtins, Spark 3.5+): the
# EXACT, mergeable companion to HLL. One bitmap covers a bucket of 32768
# consecutive integers (4 KB dense), so per (group, bucket) state is
# bounded; distinct-count is SUM over buckets of popcount, and rolling a
# fine grouping up to a coarse one is a bit-OR — associative, loss-FREE.
# This is the "exact distinct at scale" pattern (Delta/BigQuery bitmap
# rollup tables): the shuffle carries ≤ groups × occupied-buckets rows of
# ≤ 4 KB instead of every distinct key, and a persisted bitmap MV answers
# any-granularity COUNT(DISTINCT) without rescanning the fact. All four
# steps (bucket, position, construct, OR, popcount) are JVM expressions
# inside whole-stage codegen. Keys must be integral (hash non-integers
# first — then "exact" means exact-on-the-hash).
# ---------------------------------------------------------------------------


def bitmap_distinct_sketch(
    df: DataFrame, key: Column, group_cols: list[str]
) -> DataFrame:
    """Per (group, bucket) dense bitmap of an integral key: one
    partial→final aggregate, output rows = groups × occupied buckets."""
    return (
        df.select(*group_cols, key.alias("__k"))
        .groupBy(*group_cols, F.bitmap_bucket_number("__k").alias("bucket"))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("__k")).alias("bitmap")
        )
    )


def bitmap_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll fine-grained bitmaps up to `group_cols` by bit-OR per bucket
    — exact by construction (set union), never rescans the data."""
    return sketches.groupBy(*group_cols, "bucket").agg(
        F.bitmap_or_agg("bitmap").alias("bitmap")
    )


def bitmap_distinct_count(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """EXACT distinct count from bitmap state: Σ popcount over buckets."""
    return sketches.groupBy(*group_cols).agg(
        F.sum(F.bitmap_count("bitmap")).alias("n_distinct")
    )
