"""Property tests for the round-8 core primitives: ranked_by (the
two-phase distributed rank every ordering operator builds on) and the
near-dup keeper selection (exact-collapse + connected components).

Hypothesis drives the VALUE distributions; each example still runs on
the shared local Spark session, so examples are capped low and the
deadline disabled (JVM latency is not a property failure)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@given(
    keys=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
    ),
    n_shards=st.integers(min_value=1, max_value=9),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ranked_by_matches_python_sort(spark, keys, n_shards):
    """For ANY multiset of keys and ANY shard count, ranked_by assigns
    exactly the ranks a stable (key desc, id asc) sort would."""
    from quackml_spark.operators.text import ranked_by

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, k long")
    got = {
        r["id"]: r["rank"]
        for r in ranked_by(
            df, [F.desc("k"), F.asc("id")], n_shards=n_shards
        ).collect()
    }
    expected = {
        rid: pos + 1
        for pos, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == expected


@given(
    texts=st.lists(
        st.sampled_from(
            [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon eta",
                "one two three four five six seven",
                "unrelated words entirely different here now",
            ]
        ),
        min_size=2,
        max_size=16,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_near_dup_drops_keeps_exactly_one_min_id_per_cluster(spark, texts):
    """For any mix of exact/near/unique documents: every doc the drop
    set removes has a smaller-id surviving doc connected to it through
    the band graph, survivors are cluster minima, and no id is both
    kept and dropped."""
    from quackml_spark.operators.dedup import (
        connected_components,
        near_dup_drops,
        near_dup_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    drops = {r["doc_id"] for r in near_dup_drops(docs).collect()}
    comp = {
        r["doc_id"]: r["component"]
        for r in connected_components(near_dup_pairs(docs)).collect()
    }
    # reconstruct FULL-graph clusters: docs sharing text map onto their
    # graph node via the min-id of the identical-text group
    by_text: dict = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    cluster_of = {}
    for t, ids in by_text.items():
        rep = min(ids)
        label = comp.get(rep, rep)
        for i in ids:
            cluster_of[i] = label
    clusters: dict = {}
    for i, label in cluster_of.items():
        clusters.setdefault(label, set()).add(i)
    for label, members in clusters.items():
        kept = members - drops
        assert kept == {min(members)}, (label, members, drops)


def test_connected_components_raises_on_nonconvergence(spark):
    """A path graph of diameter 8 with max_rounds=2 must raise, not
    silently return partial labels (partial labels keep multiple
    representatives of one cluster and under-dedup downstream)."""
    import pytest

    from quackml_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_rounds=2)
    # and with an adequate bound the same graph labels correctly
    comp = {
        r["doc_id"]: r["component"]
        for r in connected_components(chain, max_rounds=16).collect()
    }
    assert set(comp.values()) == {0}


def test_connected_components_uses_reliable_checkpoint_dir(spark, tmp_path):
    """With a checkpoint dir configured the labeling must use RELIABLE
    snapshots (files under the dir) so labels embedded in a lazy caller
    plan survive executor loss — and must CLEAN UP superseded rounds:
    Spark's own df.checkpoint leaks every round's snapshot for the
    session lifetime unless the non-default cleanCheckpoints flag is
    on, so a long-diameter run (or repeated curate(dedup='minhash')
    calls) would accumulate |nodes| x rounds of disk (review catch).
    Exactly ONE round snapshot (the one backing the returned labels)
    may outlive each call."""
    import os

    from quackml_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        # a diameter-8 chain forces many propagation rounds, so the
        # per-round cleanup actually has rounds to clean
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(8)] + [(20, 21)],
            "doc_a long, doc_b long",
        )
        comp = {
            r["doc_id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert comp == {i: 0 for i in range(9)} | {20: 20, 21: 20}
        # Spark resolves setCheckpointDir(ckpt) to ckpt/<uuid>/, so walk
        run_dirs = [
            os.path.join(root, d)
            for root, ds, _ in os.walk(ckpt)
            for d in ds
            if d.startswith("qml_cc_")
        ]
        assert run_dirs, "no reliable snapshots were written"
        rounds = [
            d for d in os.listdir(run_dirs[0]) if d.startswith("round_")
        ]
        assert len(rounds) == 1, (
            f"superseded round snapshots not cleaned up: {sorted(rounds)}"
        )
    finally:
        sc._jsc.sc().setCheckpointDir(None)


def test_near_dup_pairs_verify_threshold_matches_true_jaccard(spark):
    """The verify step must keep EXACTLY the candidate pairs whose true
    word-3-gram Jaccard clears the threshold — checked against an
    independent Python computation over the same shingle definition."""
    from quackml_spark.operators.dedup import near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        0: base,
        1: base + " tail",                      # near-copy of 0
        2: base.replace("quick", "slow"),        # edited copy of 0
        3: "completely different words appear in this other document here",
        4: "completely different words appear in this other document here",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )

    def shingles(t):
        toks = t.lower().split()
        n = max(len(toks) - 3, 0)
        return {
            " ".join(toks[i : i + 3]) for i in range(n + 1)
        }

    def jac(a, b):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        return len(sa & sb) / len(sa | sb)

    cands = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs(docs).collect()
    }
    assert cands, "planted near-copies must band-collide"
    for thr in (0.0, 0.5, 0.9):
        kept = {
            (r["doc_a"], r["doc_b"])
            for r in near_dup_pairs(docs, verify_threshold=thr).collect()
        }
        expected = {p for p in cands if jac(*p) >= thr}
        assert kept == expected, (thr, kept, expected)
    # an impossible threshold empties the set
    assert not near_dup_pairs(docs, verify_threshold=1.01).collect()
