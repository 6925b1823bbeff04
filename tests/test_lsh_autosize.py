"""LSH parameter auto-sizing: the solver must honor its own recall
guarantee, and the wired operators must hit the target on planted
corpora across the threshold sweep 0.85–0.99."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cuckoofilter_spark.operators.similarity import (
    cosine_near_dup_pairs_blocked, lsh_near_dup_pairs,
    lsh_params_for_recall,
)


@pytest.mark.parametrize("threshold", [0.85, 0.9, 0.95, 0.99])
@pytest.mark.parametrize("target", [0.8, 0.9, 0.99])
def test_solver_satisfies_miss_bound(threshold, target):
    n_bits, n_tables = lsh_params_for_recall(threshold, target)
    p = 1.0 - math.acos(threshold) / math.pi
    miss = (1.0 - p ** n_bits) ** n_tables
    assert miss <= 1.0 - target + 1e-12
    assert 1 <= n_bits <= 24 and 1 <= n_tables <= 256


def test_solver_prefers_more_bits_at_higher_threshold():
    b_lo, _ = lsh_params_for_recall(0.85, 0.9)
    b_hi, _ = lsh_params_for_recall(0.99, 0.9)
    assert b_hi >= b_lo  # higher similarity -> more selective buckets


def test_solver_raises_below_s_curve_zone():
    # cosine 0.3 with a tiny table budget: unreachable — must refuse
    # loudly instead of returning silently-lossy parameters
    with pytest.raises(ValueError, match="S-curve"):
        lsh_params_for_recall(0.3, 0.99, max_tables=4)


def _planted_corpus(threshold: float, n_base: int, n_pairs: int,
                    dim: int, seed: int):
    """Corpus where pair (i, n_base+i) has cosine ~ threshold+0.01
    (just above the cut so the solver's at-threshold guarantee applies
    with margin) and everything else is near-orthogonal noise."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    s = min(threshold + 0.01, 0.9995)
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    for i in range(n_pairs):
        w = rng.standard_normal(dim)
        w -= (w @ base[i]) * base[i]
        w /= np.linalg.norm(w)
        v = s * base[i] + math.sqrt(1 - s * s) * w
        rows.append((n_base + i, v.tolist()))
    return rows


@pytest.mark.parametrize("threshold", [0.85, 0.9, 0.95, 0.99])
def test_auto_sized_near_dup_recall_meets_target(spark, threshold):
    target = 0.9
    dim = 32
    rows = _planted_corpus(threshold, n_base=80, n_pairs=50, dim=dim,
                           seed=int(threshold * 1000))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            emb, threshold=threshold, dim=dim, seed=7,
            target_recall=target,
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs_blocked(
            emb, threshold=threshold, n_blocks=4
        ).collect()
    }
    assert len(exact) >= 50  # the planted pairs sit above the cut
    recall = len(approx & exact) / len(exact)
    assert recall >= target, (
        f"threshold={threshold}: measured recall {recall:.3f} < "
        f"target {target}"
    )
    # precision is exact by construction (candidates verify cosine)
    assert approx <= exact


def test_multiprobe_lifts_recall_at_fixed_tables(spark):
    """Multi-probe LSH: recall is monotone in n_probes at fixed
    tables, and few-tables-many-probes beats 4x the tables at
    single-probe — the memory/shuffle trade the operator exists for
    (corpus replication factor stays at the SMALL table count)."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.similarity import (
        cosine_topk, lsh_ann_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 20)
    dim = len(emb.select("embedding").first()[0])
    tset = {(r.query_id, r.nbr) for r in cosine_topk(emb, qs, k=10).collect()}

    def recall(n_tables, n_probes):
        got = lsh_ann_topk(emb, qs, dim=dim, k=10, n_bits=8,
                           n_tables=n_tables, seed=3, n_probes=n_probes)
        g = {(r.query_id, r.nbr) for r in got.collect()}
        return len(g & tset) / len(tset)

    r1, r4, r8 = recall(4, 1), recall(4, 4), recall(4, 8)
    big = recall(16, 1)
    assert r1 <= r4 <= r8          # monotone in probes
    assert r8 > big                # 4 tables x 8 probes > 16 tables
    assert r8 >= 2 * r1            # substantive lift, not noise

    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_ann_topk(emb, qs, dim=dim, n_bits=8, n_tables=4, n_probes=10)


def test_multiprobe_near_dup_pairs_halves_replication(spark):
    """Multi-probe on the PAIR path: with the solver's single-probe
    (n_bits, n_tables) as the baseline, the asymmetric multi-probe
    join must reach equal-or-better planted-pair recall from <= half
    the total corpus replication (rows emitted per point across both
    join arms: 2*T_solver single-probe vs T_mp*(1+n_probes))."""
    threshold, target, dim = 0.9, 0.9, 32
    rows = _planted_corpus(threshold, n_base=80, n_pairs=50, dim=dim,
                           seed=900)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs_blocked(
            emb, threshold=threshold, n_blocks=4
        ).collect()
    }
    assert len(exact) >= 50

    n_bits, t_solver = lsh_params_for_recall(threshold, target)

    def recall(n_tables, n_probes):
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_near_dup_pairs(
                emb, threshold=threshold, dim=dim, seed=7,
                n_bits=n_bits, n_tables=n_tables, n_probes=n_probes,
            ).collect()
        }
        assert got <= exact  # precision stays exact
        return len(got & exact) / len(exact)

    r_single = recall(t_solver, 1)
    n_probes = 4

    # the multi-probe solver must fit the HALVED budget: total
    # replication (both arms) <= t_solver, vs single-probe's 2*t_solver
    from cuckoofilter_spark.operators.similarity import (
        lsh_multiprobe_params_for_recall,
    )

    b_mp, t_mp = lsh_multiprobe_params_for_recall(
        threshold, target, n_probes, max_replication=t_solver
    )
    assert t_mp * (1 + n_probes) <= t_solver

    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            emb, threshold=threshold, dim=dim, seed=7,
            target_recall=target, max_tables=t_solver, n_probes=n_probes,
        ).collect()
    }
    assert got <= exact
    r_multi = len(got & exact) / len(exact)
    assert r_multi >= target
    assert r_multi >= r_single - 0.02, (
        f"multi-probe recall {r_multi:.3f} fell more than noise below "
        f"single-probe {r_single:.3f} at half the replication"
    )
