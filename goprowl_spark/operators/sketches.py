"""Probabilistic sketches for frontier-scale cardinality, frequency and
distribution: HyperLogLog distinct counting, Count-Min frequency
estimation, Bloom/cuckoo false-positive audits, and mergeable
histogram quantiles.

Why these live in a crawl engine: a 10^10-URL frontier cannot afford exact
answers to "how many distinct URLs/hosts have we seen" (HLL — the
reference keeps this count exactly in memory at its scale:
search/crawlers/colly.go:22,178 `pagesVisited` and the
metrics/collector.go:25 `totalPagesProcessed` counter; at 10^10 the
mergeable-register sketch is the distributed analog), "which hosts
dominate the frontier" (Count-Min — the input to skew salting), or "is
this URL probably seen" (Bloom — the probe half of seen_filter.py; this
module *audits* a filter's false-positive rate: parameterize
bloom_fpr_audit with the m/k a deployment runs and a sampled probe set
to measure the real FP rate the crawl pays).

All three are pure Column algebra over the same 60-bit md5 hash the dedup
operators use (`dedup.h60`), so every sketch is *bit-exactly* replayable
in DuckDB — the driver's value-hash oracle verifies registers, counters,
and probe outcomes, not just shapes.

Scale shapes (the reason sketches exist):

* HLL: one explode-free map stage + ONE partial-aggregated shuffle whose
  volume is <= m rows *per partition* (map-side max per register); the
  register table is mergeable across partitions/days/clusters by simple
  MAX, so at 100 TB it is the only cardinality operator whose cost is
  O(m), not O(distinct).
* Count-Min: ONE shuffle bounded by depth x width cells per partition
  (map-side combine); the sketch (d*w rows) then BROADCASTS to estimate
  any number of candidates map-only.
* Bloom audit: bit table is <= m rows -> broadcast; probes never shuffle.
* Histogram quantiles: one min/max scan + ONE partial-aggregated shuffle
  of <= n_bins rows per partition; histograms over the same bounds merge
  by adding counts, so per-shard/per-day quantiles compose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from goprowl_spark.operators.dedup import h60, h60_sql

# --------------------------------------------------------------------- HLL
# p=10 -> m=1024 registers; the 60-bit h60 hash splits into a 10-bit
# register index (top bits) and a 50-bit word whose leading-zero count
# (rho) the register keeps the max of. 2^-rho sums stay exact by scaling
# to integers: 2^(51-rho) is a BIGINT in [1, 2^50]; the total over 1024
# registers is < 2^61 — no float until the single final division.
HLL_P = 10
HLL_M = 1 << HLL_P  # 1024
_W_BITS = 60 - HLL_P  # 50
_W_MOD = 1 << _W_BITS  # 2^50
_RHO_MAX = _W_BITS + 1  # 51
_SCALE = 1 << _RHO_MAX  # 2^51 == scaled value of an empty register (2^-0)
# alpha_1024 per Flajolet et al. 2007 (the m>=128 constant). The whole
# constant prefactor alpha*m^2*2^51 is computed ONCE in Python and injected
# into both engines as a string-cast DOUBLE: SQL literals with a decimal
# point parse as DECIMAL in both Spark and DuckDB, and decimal division
# takes a different arithmetic path than IEEE double (this produced a
# 1e-6-boundary mismatch in driver-gate testing). A repr() round-trip
# through CAST(... AS DOUBLE) is bit-exact everywhere.
_ALPHA = 0.7213 / (1.0 + 1.079 / float(HLL_M))
_HLL_PREF = _ALPHA * float(HLL_M) * float(HLL_M) * float(1 << 51)


def _hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(register, rho) for one value: register = top p bits of h60,
    rho = leading zeros of the remaining 50-bit word + 1 (bin-string
    length gives the bit length exactly — no float log)."""
    h = h60(value)
    register = F.shiftright(h, _W_BITS)
    w = h.bitwiseAND(F.lit(_W_MOD - 1))
    rho = F.when(w == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(w))
    )
    return register.cast("int").alias("register"), rho.cast("int").alias("rho")


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(register, rho) — the sketch itself, max rho per non-empty register.

    Mergeable: union two register tables and re-take MAX(rho) to sketch
    the union of the underlying sets (the property that makes HLL the
    per-partition/per-day cardinality counter at 10^10 URLs)."""
    register, rho = _hll_register_cols(F.col(col).cast("string"))
    return (
        df.select(register, rho)
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )


def _hll_estimate(sum_scaled: Column, n_zero: Column) -> Column:
    """The published estimator, shared by the global and per-group
    sketches so the correction threshold and float op order can never
    desynchronize: raw = alpha*m^2*2^51 / sum_scaled, with the
    small-range linear-counting branch (E <= 2.5m and empty registers
    -> m*ln(m/V))."""
    raw = F.lit(_HLL_PREF) / sum_scaled
    return F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (n_zero > 0),
        F.log(F.lit(float(HLL_M)) / n_zero) * F.lit(float(HLL_M)),
    ).otherwise(raw)


def _hll_estimate_sql() -> str:
    """SQL twin of _hll_estimate over columns named sum_scaled /
    n_zero_registers (same literals, same op order)."""
    raw = f"CAST('{_HLL_PREF!r}' AS DOUBLE) / sum_scaled"
    lin = (
        f"ln(CAST({HLL_M} AS DOUBLE) / n_zero_registers)"
        f" * CAST({HLL_M} AS DOUBLE)"
    )
    return (
        f"CASE WHEN {raw} <= {2.5 * HLL_M} AND n_zero_registers > 0 "
        f"THEN {lin} ELSE {raw} END"
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """One-row summary: (m, n_zero_registers, hll_estimate, exact_distinct,
    rel_err). Carries the exact distinct count alongside the estimate so
    the oracle (and the reader) verifies the error bound, not just the
    formula. Small-range correction (linear counting) applied exactly as
    published: E <= 2.5m with empty registers -> m*ln(m/V)."""
    regs = hll_registers(df, col)
    summary = regs.agg(
        F.count("*").alias("n_used"),
        F.sum(F.expr(f"CAST(pow(2.0, {_RHO_MAX} - rho) AS BIGINT)")).alias(
            "sum_used"
        ),
    ).select(
        (F.lit(HLL_M) - F.col("n_used")).cast("long").alias("n_zero_registers"),
        (
            F.col("sum_used")
            + (F.lit(HLL_M).cast("long") - F.col("n_used")) * F.lit(_SCALE)
        ).alias("sum_scaled"),
    )
    exact = df.agg(F.countDistinct(F.col(col)).alias("exact_distinct"))
    est = _hll_estimate(F.col("sum_scaled"), F.col("n_zero_registers"))
    return (
        summary.crossJoin(exact)
        .select(
            F.lit(HLL_M).alias("m"),
            F.col("n_zero_registers"),
            F.round(est, 6).alias("hll_estimate"),
            F.col("exact_distinct"),
            F.round((est - F.col("exact_distinct")) / F.col("exact_distinct"), 6).alias(
                "rel_err"
            ),
        )
    )


def hll_distinct_sql(table: str, expr: str) -> str:
    """DuckDB twin of hll_distinct — same hash, same integer registers,
    same float op order, same correction branch."""
    h = h60_sql(f"CAST({expr} AS VARCHAR)")
    est = _hll_estimate_sql()
    return f"""
WITH hashed AS (
  SELECT {h} AS h FROM {table}
),
regs AS (
  SELECT h // {_W_MOD} AS register,
         CASE WHEN h % {_W_MOD} = 0 THEN {_RHO_MAX}
              ELSE {_RHO_MAX} - length(bin(h % {_W_MOD})) END AS rho
  FROM hashed
),
sketch AS (SELECT register, max(rho) AS rho FROM regs GROUP BY register),
summary AS (
  SELECT CAST({HLL_M} - count(*) AS BIGINT) AS n_zero_registers,
         CAST(sum(CAST(pow(2.0, {_RHO_MAX} - rho) AS BIGINT))
              + ({HLL_M} - count(*)) * {_SCALE} AS BIGINT) AS sum_scaled
  FROM sketch
),
exact AS (SELECT count(DISTINCT {expr}) AS exact_distinct FROM {table})
SELECT CAST({HLL_M} AS INT) AS m,
       n_zero_registers,
       round({est}, 6) AS hll_estimate,
       exact_distinct,
       round(({est} - exact_distinct) / exact_distinct, 6) AS rel_err
FROM summary CROSS JOIN exact
"""


# --------------------------------------------------------------- Count-Min
CMS_DEPTH = 4
CMS_WIDTH = 128  # deliberately narrow so collisions (the overcount the
# sketch guarantees is one-sided) are visible and oracle-verified


def _cms_bucket(value: Column, row: int, width: int) -> Column:
    """Row r's bucket for a value: h60 over a row-tagged key, mod width.
    The '|' tag separator is safe for the integer/URL keys this engine
    hashes (no '|' in them); h60 is non-negative so % is a true mod."""
    return (h60(F.concat(F.lit(f"cms{row}|"), value)) % width).cast("int")


def cms_sketch(
    df: DataFrame, col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(row, col, cnt) — one count per touched cell, one partial-aggregated
    shuffle bounded by depth*width cells per map partition."""
    v = F.col(col).cast("string")
    entries = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(v, r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("e")
    ).select("e.row", "e.col")
    return entries.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, true_count, cms_estimate, overcount) for every key whose
    *estimate* clears the threshold — the sketch decides, as it would at
    scale where true counts don't exist; true_count rides along so the
    oracle verifies the one-sided error (estimate >= true, always).

    Plan: sketch (d*w rows) broadcasts; candidates fan out to d lookup
    rows each and take MIN over rows — the classic CMS point query."""
    sketch = cms_sketch(df, col, depth, width)
    truth = df.groupBy(F.col(col).alias("key")).agg(
        F.count("*").alias("true_count")
    )
    kv = F.col("key").cast("string")
    lookups = truth.select(
        "key",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(kv, r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("e"),
    ).select("key", "true_count", "e.row", "e.col")
    est = (
        lookups.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("key", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.where(F.col("cms_estimate") >= threshold).select(
        "key",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).alias("overcount"),
    )


def cms_heavy_hitters_sql(
    table: str,
    expr: str,
    threshold_expr: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin. threshold_expr may reference scalar CTEs the caller
    includes via the {table} name (plain integer expressions here)."""
    def bucket(e: str, r: int) -> str:
        tagged = f"'cms{r}|' || {e}"
        return f"({h60_sql(tagged)} % {width})"

    vals = f"CAST({expr} AS VARCHAR)"
    entry_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {bucket(vals, r)} AS col FROM {table}"
        for r in range(depth)
    )
    lookup_rows = " UNION ALL ".join(
        f"SELECT key, true_count, {r} AS row, "
        f"{bucket('CAST(key AS VARCHAR)', r)} AS col FROM truth"
        for r in range(depth)
    )
    return f"""
WITH entries AS ({entry_rows}),
sketch AS (SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
           FROM entries GROUP BY row, col),
truth AS (SELECT {expr} AS key, CAST(count(*) AS BIGINT) AS true_count
          FROM {table} GROUP BY {expr}),
lookups AS ({lookup_rows}),
est AS (
  SELECT key, true_count, min(cnt) AS cms_estimate
  FROM lookups JOIN sketch USING (row, col)
  GROUP BY key, true_count
)
SELECT key, true_count, cms_estimate,
       cms_estimate - true_count AS overcount
FROM est WHERE cms_estimate >= ({threshold_expr})
ORDER BY key
"""


# ------------------------------------------------------------- Bloom audit
BLOOM_BITS = 1024
BLOOM_K = 3


def _bloom_bit(value: Column, row: int, m: int) -> Column:
    return (h60(F.concat(F.lit(f"bf{row}|"), value)) % m).cast("int")


def bloom_fpr_audit(
    build_df: DataFrame,
    probe_df: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build an m-bit/k-hash Bloom filter over build_df's keys, probe it
    with probe_df's keys (assumed disjoint), and report per probe:
    (key, n_bits_hit, false_positive) — false_positive=1 iff all k bits
    are set, i.e. the filter would wrongly claim the key seen.

    This is the measured counterpart of the theoretical (1-e^{-kn/m})^k
    rate the crawl's URL-seen filter (seen_filter.py) is sized by; at
    10^10 URLs the audit runs on a sampled probe set with the same plan:
    bit table <= m rows -> broadcast, probes map-only."""
    key = F.col(key_col).cast("string")
    bits = (
        build_df.select(
            F.explode(
                F.array(*[_bloom_bit(key, r, m) for r in range(k)])
            ).alias("bit")
        )
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    probes = probe_df.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*[_bloom_bit(key, r, m) for r in range(k)])).alias(
            "bit"
        ),
    )
    hits = (
        probes.join(F.broadcast(bits), "bit", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("set_"), F.lit(0))).alias("n_bits_hit"))
    )
    return hits.select(
        "key",
        F.col("n_bits_hit").cast("long").alias("n_bits_hit"),
        F.when(F.col("n_bits_hit") == k, 1).otherwise(0).cast("int").alias(
            "false_positive"
        ),
    )


# ------------------------------------------------------------ Cuckoo audit
CUCKOO_BUCKETS = 128  # power of two so b2 = b1 XOR h(fp) stays in range
CUCKOO_CAP = 4  # entries per bucket
CUCKOO_FP_MOD = 255  # 8-bit fingerprints in [1, 255]; 0 reserved for empty


def _cuckoo_kick(fp: Column) -> Column:
    """Bucket displacement derived from the fingerprint ALONE (partial-key
    cuckoo hashing): b2 = b1 XOR kick(fp), so either bucket recovers the
    other without the original key."""
    return (h60(F.concat(F.lit("ca|"), fp.cast("string"))) % CUCKOO_BUCKETS).cast(
        "int"
    )


def cuckoo_place(build_df: DataFrame, key_col: str) -> DataFrame:
    """Deterministic two-choice cuckoo placement: (key, fp, b1, b2, slot).

    The north rule names a "Bloom/cuckoo URL-seen filter"; this is the
    cuckoo half's fingerprint table, in the *kickless* deterministic form
    (Fan et al. 2014 partial-key cuckoo hashing, minus the random-walk
    evictions — eviction order is execution-order-dependent, which would
    make the placement irreproducible across engines; the seen-filter
    backend in seen_filter.py carries the evicting variant, where a single
    Python process per shard owns insertion order):

    * fp(key)   = 8-bit fingerprint in [1, 255]
    * b1(key)   = h60 % NB;  b2 = b1 XOR h60(fp) % NB (partial-key: b2 is
      derivable from (b1, fp) alone — the property that makes deletion and
      relocation possible without the original key)
    * stage 1: every key tries b1; the first CAP per bucket (ordered by
      key — the deterministic stand-in for arrival order) stay (slot=1)
    * stage 2: the overflow tries b2 against that bucket's residual
      capacity, same ordering (slot=2)
    * the rest go to an exact stash (slot=0) — a production filter treats
      stash pressure as its resize signal

    Both stages are window ranks over the build side only; at 10^10 URLs
    the filter shards by pmod(h60(key), n_shards) exactly like the Bloom
    blobs in seen_filter.py, and each shard's windows stay bucket-local."""
    key = F.col(key_col).cast("string")
    fp = (h60(F.concat(F.lit("cf|"), key)) % CUCKOO_FP_MOD + 1).cast("int")
    b1 = (h60(F.concat(F.lit("cb|"), key)) % CUCKOO_BUCKETS).cast("int")
    base = build_df.select(
        key.alias("key"), fp.alias("fp"), b1.alias("b1")
    ).withColumn("b2", F.col("b1").bitwiseXOR(_cuckoo_kick(F.col("fp"))))

    w1 = Window.partitionBy("b1").orderBy("key")
    staged = base.withColumn("rn1", F.row_number().over(w1))
    # primary arrivals per bucket (NOT capped): residual capacity for
    # stage 2 is CAP - least(arrivals, CAP)
    occ1 = (
        staged.groupBy("b1")
        .agg(F.least(F.count("*"), F.lit(CUCKOO_CAP)).alias("occ1"))
        .withColumnRenamed("b1", "bucket")
    )
    overflow = staged.where(F.col("rn1") > CUCKOO_CAP).join(
        F.broadcast(occ1), F.col("b2") == F.col("bucket"), "left"
    )
    w2 = Window.partitionBy("b2").orderBy("key")
    overflow = overflow.withColumn("rn2", F.row_number().over(w2)).withColumn(
        "cap2", F.lit(CUCKOO_CAP) - F.coalesce(F.col("occ1"), F.lit(0))
    )
    placed1 = staged.where(F.col("rn1") <= CUCKOO_CAP).select(
        "key", "fp", "b1", "b2", F.lit(1).alias("slot")
    )
    rest = overflow.select(
        "key",
        "fp",
        "b1",
        "b2",
        F.when(F.col("rn2") <= F.col("cap2"), 2).otherwise(0).alias("slot"),
    )
    return placed1.unionByName(rest).select(
        "key", "fp", "b1", "b2", F.col("slot").cast("int").alias("slot")
    )


def cuckoo_probe(
    build_df: DataFrame, probe_df: DataFrame, key_col: str
) -> DataFrame:
    """Probe the cuckoo table: per probe key (key, fp_hits, in_stash,
    maybe_present). fp_hits counts placed entries sharing the probe's
    fingerprint in either candidate bucket; stash keys match exactly.
    maybe_present=0 for an inserted key is impossible (its own entry is
    in one of its buckets or the stash) — the zero-false-negative
    property tests pin.

    Plan shape: the entry table is <= NB*CAP rows and the stash is the
    overflow tail -> both BROADCAST; probes are map-only plus the two
    broadcast joins, never shuffled — the same probe-side discipline as
    bloom_fpr_audit."""
    placement = cuckoo_place(build_df, key_col)
    entries = placement.where(F.col("slot") > 0).select(
        F.when(F.col("slot") == 1, F.col("b1"))
        .otherwise(F.col("b2"))
        .alias("bucket"),
        F.col("fp").alias("efp"),
    )
    stash = placement.where(F.col("slot") == 0).select(
        F.col("key").alias("skey"), F.lit(1).alias("stash_hit")
    )

    key = F.col(key_col).cast("string")
    fp = (h60(F.concat(F.lit("cf|"), key)) % CUCKOO_FP_MOD + 1).cast("int")
    b1 = (h60(F.concat(F.lit("cb|"), key)) % CUCKOO_BUCKETS).cast("int")
    probes = probe_df.select(
        key.alias("key"), fp.alias("fp"), b1.alias("b1")
    ).withColumn("b2", F.col("b1").bitwiseXOR(_cuckoo_kick(F.col("fp"))))
    # distinct candidate buckets (b1 may equal b2 when the kick lands on 0);
    # the dropDuplicates mirrors the oracle's `SELECT DISTINCT key, fp,
    # bucket` cands CTE — without it a probe_df carrying repeated keys
    # would multiply fp_hits per duplicate row in the groupBy below
    cands = probes.select(
        "key", "fp", F.explode(F.array_distinct(F.array("b1", "b2"))).alias("bucket")
    ).dropDuplicates(["key", "fp", "bucket"])
    hits = cands.join(
        F.broadcast(entries.withColumnRenamed("bucket", "ebucket")),
        (F.col("bucket") == F.col("ebucket")) & (F.col("fp") == F.col("efp")),
        "left",
    )
    per_key = hits.groupBy("key").agg(
        F.sum(F.when(F.col("efp").isNotNull(), 1).otherwise(0)).alias("fp_hits")
    )
    return (
        per_key.join(F.broadcast(stash), F.col("key") == F.col("skey"), "left")
        .select(
            "key",
            F.col("fp_hits").cast("long").alias("fp_hits"),
            F.coalesce(F.col("stash_hit"), F.lit(0)).cast("int").alias("in_stash"),
            F.when((F.col("fp_hits") > 0) | F.col("stash_hit").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("maybe_present"),
        )
    )


def cuckoo_fpr_audit(
    build_df: DataFrame, probe_df: DataFrame, key_col: str
) -> DataFrame:
    """False-positive audit of the cuckoo fingerprint table: probe with
    keys disjoint from the build set; any maybe_present is a false
    positive (expected rate ~ 2*CAP/2^f when buckets run full — the
    fingerprint-width sizing rule for the URL-seen filter, vs the Bloom
    (1-e^{-kn/m})^k law next door)."""
    p = cuckoo_probe(build_df, probe_df, key_col)
    return p.select(
        "key",
        "fp_hits",
        "in_stash",
        F.col("maybe_present").alias("false_positive"),
    )


def cuckoo_fpr_audit_sql(build_select: str, probe_select: str) -> str:
    """DuckDB twin: same fingerprints, same XOR bucket pair, same two
    window-ranked placement stages, same broadcast-shaped probe joins."""
    nb, cap, fpm = CUCKOO_BUCKETS, CUCKOO_CAP, CUCKOO_FP_MOD

    def fp(col: str) -> str:
        tagged = f"'cf|' || CAST({col} AS VARCHAR)"
        return f"({h60_sql(tagged)} % {fpm} + 1)"

    def b1(col: str) -> str:
        tagged = f"'cb|' || CAST({col} AS VARCHAR)"
        return f"({h60_sql(tagged)} % {nb})"

    kick_tag = "'ca|' || CAST(fp AS VARCHAR)"
    kick = f"({h60_sql(kick_tag)} % {nb})"
    return f"""
WITH build AS ({build_select}),
probe AS ({probe_select}),
base AS (
  SELECT CAST(key AS VARCHAR) AS key,
         CAST({fp('key')} AS INT) AS fp,
         CAST({b1('key')} AS INT) AS b1
  FROM build
),
based AS (
  SELECT key, fp, b1, CAST(xor(b1, {kick}) AS INT) AS b2,
         ROW_NUMBER() OVER (PARTITION BY b1 ORDER BY key) AS rn1
  FROM base
),
occ1 AS (
  SELECT b1 AS bucket, LEAST(count(*), {cap}) AS occ1 FROM based GROUP BY b1
),
overflow AS (
  SELECT o.key, o.fp, o.b1, o.b2,
         ROW_NUMBER() OVER (PARTITION BY o.b2 ORDER BY o.key) AS rn2,
         {cap} - COALESCE(c.occ1, 0) AS cap2
  FROM based o LEFT JOIN occ1 c ON o.b2 = c.bucket
  WHERE o.rn1 > {cap}
),
entries AS (
  SELECT b1 AS bucket, fp AS efp FROM based WHERE rn1 <= {cap}
  UNION ALL
  SELECT b2 AS bucket, fp AS efp FROM overflow WHERE rn2 <= cap2
),
stash AS (SELECT key AS skey FROM overflow WHERE rn2 > cap2),
pbase AS (
  SELECT CAST(key AS VARCHAR) AS key,
         CAST({fp('key')} AS INT) AS fp,
         CAST({b1('key')} AS INT) AS b1
  FROM probe
),
pboth AS (
  SELECT key, fp, b1, CAST(xor(b1, {kick}) AS INT) AS b2 FROM pbase
),
cands AS (
  SELECT DISTINCT key, fp, bucket FROM (
    SELECT key, fp, b1 AS bucket FROM pboth
    UNION ALL
    SELECT key, fp, b2 AS bucket FROM pboth
  )
),
hits AS (
  SELECT c.key,
         CAST(sum(CASE WHEN e.efp IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS fp_hits
  FROM cands c
  LEFT JOIN entries e ON c.bucket = e.bucket AND c.fp = e.efp
  GROUP BY c.key
)
SELECT h.key, h.fp_hits,
       CAST(CASE WHEN s.skey IS NULL THEN 0 ELSE 1 END AS INT) AS in_stash,
       CAST(CASE WHEN h.fp_hits > 0 OR s.skey IS NOT NULL THEN 1 ELSE 0 END
            AS INT) AS false_positive
FROM hits h LEFT JOIN stash s ON h.key = s.skey
ORDER BY h.key
"""


def bloom_fpr_audit_sql(
    build_select: str,
    probe_select: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin; build_select/probe_select are one-column (key) SELECTs."""
    def bit(r: int) -> str:
        tagged = f"'bf{r}|' || CAST(key AS VARCHAR)"
        return f"({h60_sql(tagged)} % {m})"

    bit_rows = " UNION ALL ".join(
        f"SELECT {bit(r)} AS bit FROM build" for r in range(k)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT key, {bit(r)} AS bit FROM probe" for r in range(k)
    )
    return f"""
WITH build AS ({build_select}),
probe AS ({probe_select}),
bits AS (SELECT DISTINCT bit FROM ({bit_rows})),
probes AS ({probe_rows}),
hits AS (
  SELECT p.key,
         CAST(sum(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_bits_hit
  FROM probes p LEFT JOIN bits b ON p.bit = b.bit
  GROUP BY p.key
)
SELECT key, n_bits_hit,
       CAST(CASE WHEN n_bits_hit = {k} THEN 1 ELSE 0 END AS INT)
         AS false_positive
FROM hits
ORDER BY key
"""


# ---------------------------------------------------- histogram quantiles
# The distribution sketch next to HLL (cardinality) and Count-Min
# (frequency): mergeable fixed-width histogram quantiles. Curation
# thresholds are usually PERCENTILE cutoffs ("drop docs below the p10
# length", "cap at the p99 token count"); exact quantiles at 100 TB need
# a global sort, while the histogram needs one min/max scan plus ONE
# partial-aggregated shuffle of <= n_bins rows per partition — and two
# histograms over the same bounds merge by adding counts (per-day /
# per-shard quantiles compose by construction). All arithmetic is
# INTEGER (bin = (v - lo) DIV w with w = (hi - lo) DIV n_bins + 1;
# rank = integer ceil), and the quantile is reported as the containing
# bin's [est_lo, est_hi] bounds — resolution = one bin width, an honest
# deterministic error bar — so the DuckDB twin is bit-exact with no
# IEEE-double or DECIMAL-promotion edge cases anywhere.


def hist_quantiles(
    df: DataFrame,
    col: str,
    n_bins: int = 256,
    q_permille: tuple[int, ...] = (250, 500, 750, 900, 990),
) -> DataFrame:
    """(q_permille, rank, bin, est_lo, est_hi) — one row per requested
    per-mille quantile; the exact q-quantile value lies in [est_lo,
    est_hi] (the containing bin's bounds). The min/max/count bounds ride
    in-plan via a broadcast 1-row cross join — nothing touches the
    driver; the cumulative window runs over <= n_bins rows (a constant,
    whatever the input size), so the unpartitioned window is metadata
    work, not a scale hazard."""
    nb = int(n_bins)
    vals = df.select(F.col(col).cast("long").alias("v")).where(
        F.col("v").isNotNull()
    )
    bounds = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
    )
    # w = (hi-lo) DIV n_bins + 1 > (hi-lo)/n_bins, so bins land in
    # [0, n_bins-1]; integer DIV matches DuckDB's // exactly
    binned = (
        vals.join(F.broadcast(bounds))
        .select(F.expr(f"(v - lo) DIV ((hi - lo) DIV {nb} + 1)").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.withColumn("cum", F.sum("cnt").over(wcum))
    targets = bounds.select(
        F.explode(
            F.array(*[F.lit(int(q)) for q in q_permille])
        ).alias("q_permille"),
        "lo",
        "hi",
        "n",
    ).withColumn(
        # integer ceil(q*n/1000), clamped to >= 1
        "rank",
        F.expr("greatest(CAST(1 AS BIGINT), (q_permille * n + 999) DIV 1000)"),
    )
    hit = (
        targets.join(cum, F.col("cum") >= F.col("rank"))
        .groupBy("q_permille", "rank", "lo", "hi")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        hit.select(
            F.col("q_permille").cast("long").alias("q_permille"),
            F.col("rank").cast("long").alias("rank"),
            F.col("bin").cast("long").alias("bin"),
            F.expr(f"lo + bin * ((hi - lo) DIV {nb} + 1)")
            .cast("long")
            .alias("est_lo"),
            F.expr(f"least(hi, lo + (bin + 1) * ((hi - lo) DIV {nb} + 1) - 1)")
            .cast("long")
            .alias("est_hi"),
        )
        .orderBy("q_permille")
    )


def hist_quantiles_sql(
    table: str,
    expr: str,
    n_bins: int = 256,
    q_permille: tuple[int, ...] = (250, 500, 750, 900, 990),
) -> str:
    """DuckDB twin — same integer bin/rank arithmetic (// == Spark DIV);
    the window sum casts to BIGINT (DuckDB promotes to HUGEINT, which the
    driver's value hash rejects)."""
    nb = int(n_bins)
    qs = ", ".join(str(int(q)) for q in q_permille)
    return f"""
WITH vals AS (
  SELECT CAST({expr} AS BIGINT) AS v FROM {table} WHERE ({expr}) IS NOT NULL
),
bounds AS (SELECT min(v) AS lo, max(v) AS hi, count(v) AS n FROM vals),
binned AS (
  SELECT (v - lo) // ((hi - lo) // {nb} + 1) AS bin, count(*) AS cnt
  FROM vals, bounds GROUP BY 1
),
cum AS (
  SELECT bin,
         CAST(sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM binned
),
targets AS (
  SELECT q_permille, lo, hi, n,
         greatest(CAST(1 AS BIGINT), (q_permille * n + 999) // 1000) AS rank
  FROM (SELECT unnest([{qs}]) AS q_permille), bounds
),
hit AS (
  SELECT t.q_permille, t.rank, t.lo, t.hi, min(c.bin) AS bin
  FROM targets t JOIN cum c ON c.cum >= t.rank
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(q_permille AS BIGINT) AS q_permille,
       CAST(rank AS BIGINT) AS rank,
       CAST(bin AS BIGINT) AS bin,
       CAST(lo + bin * ((hi - lo) // {nb} + 1) AS BIGINT) AS est_lo,
       CAST(least(hi, lo + (bin + 1) * ((hi - lo) // {nb} + 1) - 1)
            AS BIGINT) AS est_hi
FROM hit
ORDER BY q_permille
"""


def hll_distinct_by(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """Per-group HLL: (group, n_zero_registers, hll_estimate,
    exact_distinct, rel_err) — one row per group. The 100-TB pattern this
    exists for is per-host frontier cardinality ("how many distinct URLs
    has each host contributed") where a groupBy-countDistinct would
    shuffle every distinct value: here the wide shuffle carries at most m
    register rows PER GROUP (map-side partial max), and per-group
    sketches merge across days/partitions by MAX(rho). ``exact_distinct``
    / ``rel_err`` are audit columns (they pay the exact countDistinct) —
    drop them in production and keep the estimate.

    Same registers, float op order and small-range correction as
    hll_distinct, so the DuckDB twin is exact."""
    register, rho = _hll_register_cols(F.col(col).cast("string"))
    regs = (
        df.select(F.col(group_col).alias("grp"), register, rho)
        .groupBy("grp", "register")
        .agg(F.max("rho").alias("rho"))
    )
    summary = regs.groupBy("grp").agg(
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("n_zero_registers"),
        (
            F.sum(F.expr(f"CAST(pow(2.0, {_RHO_MAX} - rho) AS BIGINT)"))
            + (F.lit(HLL_M).cast("long") - F.count("*")) * F.lit(_SCALE)
        ).alias("sum_scaled"),
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(F.col(col)).alias("exact_distinct")
    )
    est = _hll_estimate(F.col("sum_scaled"), F.col("n_zero_registers"))
    return (
        summary.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_zero_registers"),
            F.round(est, 6).alias("hll_estimate"),
            F.col("exact_distinct"),
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
        .orderBy(group_col)
    )


def hll_distinct_by_sql(table: str, group_expr: str, expr: str) -> str:
    """DuckDB twin of hll_distinct_by — hll_distinct_sql with GROUP BY."""
    h = h60_sql(f"CAST({expr} AS VARCHAR)")
    est = _hll_estimate_sql()
    return f"""
WITH hashed AS (
  SELECT {group_expr} AS grp, {h} AS h FROM {table}
),
regs AS (
  SELECT grp, h // {_W_MOD} AS register,
         CASE WHEN h % {_W_MOD} = 0 THEN {_RHO_MAX}
              ELSE {_RHO_MAX} - length(bin(h % {_W_MOD})) END AS rho
  FROM hashed
),
sketch AS (
  SELECT grp, register, max(rho) AS rho FROM regs GROUP BY grp, register
),
summary AS (
  SELECT grp,
         CAST({HLL_M} - count(*) AS BIGINT) AS n_zero_registers,
         CAST(sum(CAST(pow(2.0, {_RHO_MAX} - rho) AS BIGINT))
              + ({HLL_M} - count(*)) * {_SCALE} AS BIGINT) AS sum_scaled
  FROM sketch GROUP BY grp
),
exact AS (
  SELECT {group_expr} AS grp, count(DISTINCT {expr}) AS exact_distinct
  FROM {table} GROUP BY grp
)
SELECT s.grp AS {group_expr},
       n_zero_registers,
       round({est}, 6) AS hll_estimate,
       exact_distinct,
       round(({est} - exact_distinct) / exact_distinct, 6) AS rel_err
FROM summary s JOIN exact e ON s.grp = e.grp
ORDER BY s.grp
"""
