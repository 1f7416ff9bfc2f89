"""Sketch operators: HyperLogLog, Count-Min, Bloom FPR audit.

Each sketch is verified three ways: against an exact pure-Python
recomputation of the same deterministic hash math (bit-for-bit), against
its published guarantee (HLL error bound, CMS one-sided error, Bloom
zero false negatives), and — via the contract — against the DuckDB SQL
twin the driver's value-hash oracle runs.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from goprowl_spark.operators import sketches
from goprowl_spark.operators.sketches import (
    BLOOM_BITS,
    BLOOM_K,
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    HLL_P,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll_registers(values: list[str]) -> dict[int, int]:
    regs: dict[int, int] = {}
    w_bits = 60 - HLL_P
    for v in values:
        h = _h60(v)
        idx = h >> w_bits
        w = h & ((1 << w_bits) - 1)
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


KEYS = [f"key-{i}" for i in range(3000)]


@pytest.fixture(scope="module")
def keys_df(spark):
    # duplicate every third key: HLL must count values, not rows
    rows = [(k,) for k in KEYS] + [(k,) for k in KEYS[::3]]
    return spark.createDataFrame(rows, "v string")


class TestHLL:
    def test_registers_match_python_recompute(self, spark, keys_df):
        got = {
            r["register"]: r["rho"]
            for r in sketches.hll_registers(keys_df, "v").collect()
        }
        assert got == _py_hll_registers(KEYS)

    def test_estimate_within_published_bound(self, spark, keys_df):
        row = sketches.hll_distinct(keys_df, "v").collect()[0]
        assert row["exact_distinct"] == len(KEYS)
        # 1.04/sqrt(m) ~ 3.3% stderr; 4 sigma is a deterministic-data bound
        assert abs(row["rel_err"]) < 4 * 1.04 / math.sqrt(HLL_M)
        assert row["m"] == HLL_M
        assert row["hll_estimate"] == pytest.approx(
            row["exact_distinct"] * (1 + row["rel_err"]), rel=1e-4
        )

    def test_registers_merge_by_max(self, spark):
        """sketch(A ∪ B) == MAX-merge(sketch(A), sketch(B)) — the property
        that makes HLL the per-partition cardinality counter at scale."""
        a = spark.createDataFrame([(k,) for k in KEYS[:1500]], "v string")
        b = spark.createDataFrame([(k,) for k in KEYS[1000:]], "v string")
        union = sketches.hll_registers(a.union(b), "v")
        merged = (
            sketches.hll_registers(a, "v")
            .union(sketches.hll_registers(b, "v"))
            .groupBy("register")
            .agg(F.max("rho").alias("rho"))
        )
        assert sorted(map(tuple, union.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_small_range_linear_counting_branch(self, spark):
        """A handful of values leaves most registers empty -> the estimate
        must come from linear counting m*ln(m/V) and be near-exact."""
        few = spark.createDataFrame([(f"x{i}",) for i in range(20)], "v string")
        row = sketches.hll_distinct(few, "v").collect()[0]
        v = row["n_zero_registers"]
        assert v >= HLL_M - 20
        assert row["hll_estimate"] == pytest.approx(
            round(HLL_M * math.log(HLL_M / v), 6), abs=1e-6
        )
        assert abs(row["rel_err"]) < 0.05


def _py_cms(values: list[str]) -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = {}
    for v in values:
        for r in range(CMS_DEPTH):
            c = _h60(f"cms{r}|{v}") % CMS_WIDTH
            cells[(r, c)] = cells.get((r, c), 0) + 1
    return cells


class TestCMS:
    @pytest.fixture(scope="class")
    def freq_df(self, spark):
        # key i appears i+1 times, 200 keys -> skewed multiset
        rows = [(f"u{i}",) for i in range(200) for _ in range(i + 1)]
        return spark.createDataFrame(rows, "v string")

    def test_sketch_matches_python_recompute(self, spark, freq_df):
        vals = [f"u{i}" for i in range(200) for _ in range(i + 1)]
        got = {
            (r["row"], r["col"]): r["cnt"]
            for r in sketches.cms_sketch(freq_df, "v").collect()
        }
        assert got == _py_cms(vals)

    def test_estimates_one_sided_and_complete(self, spark, freq_df):
        out = sketches.cms_heavy_hitters(freq_df, "v", threshold=150).collect()
        by_key = {r["key"]: r for r in out}
        # one-sided error: estimate >= true for every reported key
        assert all(r["cms_estimate"] >= r["true_count"] for r in out)
        assert all(r["overcount"] == r["cms_estimate"] - r["true_count"] for r in out)
        # completeness: every TRUE heavy hitter is reported (estimate >= true
        # >= threshold can never be filtered out)
        for i in range(149, 200):
            assert f"u{i}" in by_key
            assert by_key[f"u{i}"]["true_count"] == i + 1

    def test_point_estimate_is_min_over_rows(self, spark, freq_df):
        vals = [f"u{i}" for i in range(200) for _ in range(i + 1)]
        cells = _py_cms(vals)
        out = sketches.cms_heavy_hitters(freq_df, "v", threshold=150).collect()
        for r in out:
            expect = min(
                cells[(d, _h60(f"cms{d}|{r['key']}") % CMS_WIDTH)]
                for d in range(CMS_DEPTH)
            )
            assert r["cms_estimate"] == expect


class TestBloom:
    @pytest.fixture(scope="class")
    def halves(self, spark):
        build = spark.createDataFrame([(f"d{i}",) for i in range(0, 500, 2)], "k string")
        probe = spark.createDataFrame([(f"d{i}",) for i in range(1, 500, 2)], "k string")
        return build, probe

    def test_no_false_negatives(self, spark, halves):
        """Probing the build set itself: every key must hit all k bits —
        the invariant the crawl's URL-seen filter depends on."""
        build, _ = halves
        out = sketches.bloom_fpr_audit(build, build, "k").collect()
        assert len(out) == 250
        assert all(r["n_bits_hit"] == BLOOM_K and r["false_positive"] == 1 for r in out)

    def test_fpr_matches_python_recompute(self, spark, halves):
        build, probe = halves
        bits = {
            _h60(f"bf{r}|d{i}") % BLOOM_BITS
            for i in range(0, 500, 2)
            for r in range(BLOOM_K)
        }
        expect = {}
        for i in range(1, 500, 2):
            hit = sum(
                1
                for r in range(BLOOM_K)
                if _h60(f"bf{r}|d{i}") % BLOOM_BITS in bits
            )
            expect[f"d{i}"] = (hit, 1 if hit == BLOOM_K else 0)
        got = {
            r["key"]: (r["n_bits_hit"], r["false_positive"])
            for r in sketches.bloom_fpr_audit(build, probe, "k").collect()
        }
        assert got == expect
        # measured rate should sit near the (1-e^{-kn/m})^k theory line
        n, m, k = 250, BLOOM_BITS, BLOOM_K
        theory = (1 - math.exp(-k * n / m)) ** k
        measured = sum(fp for _, fp in got.values()) / len(got)
        assert abs(measured - theory) < 0.08


def _py_cuckoo_place(keys: list[str]) -> dict[str, tuple[int, int, int, int]]:
    """Pure-Python twin of sketches.cuckoo_place: key -> (fp, b1, b2, slot)."""
    nb, cap, fpm = (
        sketches.CUCKOO_BUCKETS,
        sketches.CUCKOO_CAP,
        sketches.CUCKOO_FP_MOD,
    )
    rows = []
    for k in keys:
        fp = _h60(f"cf|{k}") % fpm + 1
        b1 = _h60(f"cb|{k}") % nb
        b2 = b1 ^ (_h60(f"ca|{fp}") % nb)
        rows.append((k, fp, b1, b2))
    placed: dict[str, tuple[int, int, int, int]] = {}
    occ1: dict[int, int] = {}
    overflow = []
    for k, fp, b1, b2 in sorted(rows):  # stage 1 in key order per bucket
        seen_in_b1 = occ1.get(b1, 0)
        if seen_in_b1 < cap:
            occ1[b1] = seen_in_b1 + 1
            placed[k] = (fp, b1, b2, 1)
        else:
            overflow.append((k, fp, b1, b2))
    # stage 2: residual capacity = cap - primary placements
    occ2: dict[int, int] = {}
    for k, fp, b1, b2 in sorted(overflow):
        cap2 = cap - min(occ1.get(b2, 0), cap)
        used = occ2.get(b2, 0)
        if used < cap2:
            occ2[b2] = used + 1
            placed[k] = (fp, b1, b2, 2)
        else:
            placed[k] = (fp, b1, b2, 0)
    return placed


class TestCuckoo:
    @pytest.fixture(scope="class")
    def halves(self, spark):
        build = spark.createDataFrame(
            [(f"d{i}",) for i in range(0, 500, 2)], "k string"
        )
        probe = spark.createDataFrame(
            [(f"d{i}",) for i in range(1, 500, 2)], "k string"
        )
        return build, probe

    def test_placement_matches_python_twin(self, spark, halves):
        build, _ = halves
        got = {
            r["key"]: (r["fp"], r["b1"], r["b2"], r["slot"])
            for r in sketches.cuckoo_place(build, "k").collect()
        }
        assert got == _py_cuckoo_place([f"d{i}" for i in range(0, 500, 2)])

    def test_no_false_negatives(self, spark, halves):
        """Probing the build set itself: every inserted key must be
        maybe_present — placed keys match their own fingerprint; stashed
        keys match the exact stash."""
        build, _ = halves
        out = sketches.cuckoo_probe(build, build, "k").collect()
        assert len(out) == 250
        assert all(r["maybe_present"] == 1 for r in out)

    def test_stash_engages_past_capacity_and_stays_exact(self, spark):
        """Overload the table (700 keys > 512 slots): the kickless
        placement must stash the overflow, and stashed keys must still
        probe present (exact match, zero false negatives under overload)."""
        keys = [f"s{i}" for i in range(700)]
        build = spark.createDataFrame([(k,) for k in keys], "k string")
        placement = sketches.cuckoo_place(build, "k").collect()
        slots = {r["key"]: r["slot"] for r in placement}
        n_stash = sum(1 for s in slots.values() if s == 0)
        assert n_stash >= 700 - sketches.CUCKOO_BUCKETS * sketches.CUCKOO_CAP
        assert n_stash == sum(
            1 for v in _py_cuckoo_place(keys).values() if v[3] == 0
        )
        out = sketches.cuckoo_probe(build, build, "k").collect()
        assert all(r["maybe_present"] == 1 for r in out)
        by_key = {r["key"]: r for r in out}
        for k, s in slots.items():
            if s == 0:
                assert by_key[k]["in_stash"] == 1

    def test_fpr_near_fingerprint_theory(self, spark, halves):
        """Disjoint probes: FP rate ~ 1-(1-1/fpm)^(occupancy of 2 buckets);
        with ~2 entries/bucket that's ~4/255 ~ 1.6%. Assert the measured
        rate is small and every FP really collides on a fingerprint."""
        build, probe = halves
        out = sketches.cuckoo_fpr_audit(build, probe, "k").collect()
        n_fp = sum(r["false_positive"] for r in out)
        assert n_fp / len(out) < 0.10
        assert all(
            (r["false_positive"] == 1) == (r["fp_hits"] > 0 or r["in_stash"] == 1)
            for r in out
        )

    def test_partial_key_property(self):
        """b2 is derivable from (b1, fp) alone — and the relation is an
        involution: XORing the kick again recovers b1 (the property real
        cuckoo eviction relies on to relocate entries without their keys)."""
        nb = sketches.CUCKOO_BUCKETS
        for i in range(100):
            fp = _h60(f"cf|d{i}") % sketches.CUCKOO_FP_MOD + 1
            b1 = _h60(f"cb|d{i}") % nb
            kick = _h60(f"ca|{fp}") % nb
            b2 = b1 ^ kick
            assert 0 <= b2 < nb
            assert b2 ^ kick == b1


# ----------------------------------------------------- histogram quantiles

def test_hist_quantiles_containment_and_oracle(spark):
    """Every reported [est_lo, est_hi] must contain the exact rank-order
    quantile, bit-exactly matching the DuckDB twin (all-integer bin math)."""
    import duckdb
    import numpy as np

    from goprowl_spark.operators.sketches import (
        hist_quantiles,
        hist_quantiles_sql,
    )

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [
            rng.integers(0, 5000, 2500),        # bulk
            rng.integers(400000, 400050, 40),   # far outlier tail
            np.full(200, 7),                    # heavy spike
        ]
    )
    df = spark.createDataFrame([(int(v),) for v in vals], ["x"])
    got = sorted(tuple(r) for r in hist_quantiles(df, "x", n_bins=64).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals.tolist()])
    want = sorted(con.sql(hist_quantiles_sql("t", "x", n_bins=64)).fetchall())
    assert got == want
    sv = np.sort(vals)
    for _qp, rank, _bin, lo, hi in got:
        assert lo <= sv[rank - 1] <= hi


def test_hist_quantiles_merge_property(spark):
    """Two histograms over the same bounds merge by adding counts: the
    sketch of a union equals the union's sketch (same bins, same answer) —
    checked by splitting the input arbitrarily and comparing to the whole."""
    import numpy as np

    from goprowl_spark.operators.sketches import hist_quantiles

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 100000, 4000)
    whole = spark.createDataFrame([(int(v),) for v in vals], ["x"])
    # arbitrary 2-way partition of the same rows, recombined
    parts = spark.createDataFrame(
        [(int(v),) for v in vals[::2]] + [(int(v),) for v in vals[1::2]], ["x"]
    )
    a = sorted(tuple(r) for r in hist_quantiles(whole, "x", n_bins=32).collect())
    b = sorted(tuple(r) for r in hist_quantiles(parts, "x", n_bins=32).collect())
    assert a == b


def test_hll_distinct_by_matches_global_per_group(spark):
    """Per-group HLL must equal running the global sketch on each group's
    rows alone (same registers, same correction), and every group's
    estimate must respect the published error envelope."""
    import numpy as np

    from goprowl_spark.operators.sketches import hll_distinct, hll_distinct_by

    rng = np.random.default_rng(9)
    rows = [
        (f"g{int(v) % 3}", int(rng.integers(0, 2000)))
        for v in rng.integers(0, 3, 6000)
    ]
    df = spark.createDataFrame(rows, ["grp", "val"])
    per_group = {
        r["grp"]: (r["hll_estimate"], r["exact_distinct"], r["rel_err"])
        for r in hll_distinct_by(df, "grp", "val").collect()
    }
    assert set(per_group) == {"g0", "g1", "g2"}
    for g, (est, exact, rel) in per_group.items():
        solo = hll_distinct(df.where(df.grp == g), "val").collect()[0]
        assert (solo["hll_estimate"], solo["exact_distinct"]) == (est, exact)
        assert abs(rel) < 0.15
