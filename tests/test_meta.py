"""Guardrails: docs must match the registry; scale rules stay enforced."""

from __future__ import annotations

import re
from pathlib import Path

from quackml_spark.plans import REGISTRY, _load_all

_load_all()
REPO = Path(__file__).resolve().parent.parent


def test_coverage_md_query_names_exist():
    """Every `backticked_name` in COVERAGE.md that looks like a registry
    query must actually be registered (no doc rot)."""
    text = (REPO / "COVERAGE.md").read_text()
    referenced = {
        m
        for m in re.findall(r"`([a-z0-9_]+)`", text)
        if re.match(r"^(q\d+_|ml_|llm_|dedup_|ann_|text_|multimodal_|streaming_|sketch_)", m)
    }
    missing = sorted(r for r in referenced if r not in REGISTRY)
    assert not missing, f"COVERAGE.md references unregistered queries: {missing}"


def test_graded_window_fits_driver_and_covers_every_family():
    """The external driver grades the first 50 registered queries
    alphabetically. Round 2 lost driver rows for 31 queries because the
    registry outgrew that window — so graded-set membership is now an
    explicit flag, asserted here: (a) the graded set fits the window,
    (b) every graded query is value-checked (has an oracle), and
    (c) every operator family keeps at least one graded representative
    (no family is pytest-only)."""
    from quackml_spark.plans import GRADED_SLOTS, graded_oracles, graded_queries

    graded = graded_queries()
    assert len(graded) <= GRADED_SLOTS, (
        f"{len(graded)} graded queries > driver window of {GRADED_SLOTS}; "
        "mark redundant twins extra=True"
    )
    missing_oracle = sorted(set(graded) - set(graded_oracles()))
    assert not missing_oracle, f"graded but not value-checked: {missing_oracle}"
    families = {
        # "embedding_" dropped r12: embedding_cosine_dedup was demoted to
        # extra (shape-twin of the still-graded dedup_semantic, which
        # value-checks the same LSH-candidates -> exact-cosine shape) to
        # free a graded slot for dedup_setsim_index. "pipeline_" added:
        # curate() now has two graded modes (report + ppjoin).
        "ann_", "dedup_", "llm_", "ml_", "multimodal_", "pipeline_",
        "q", "sketch_", "streaming_", "text_",
    }
    for fam in families:
        assert any(n.startswith(fam) for n in graded), f"family {fam}* has no graded row"


def test_all_queries_is_the_full_registry():
    """Round-3 advice: all_queries() must mean what it says — the FULL
    registered surface. The driver window is the separate, explicitly
    named graded_queries() (wired in __spark_entry__.py), so curation is
    opt-in at the call site, not a semantic change to the public API."""
    from quackml_spark.plans import all_queries, extra_queries, graded_queries

    full, graded, extra = all_queries(), graded_queries(), extra_queries()
    assert set(full) == set(REGISTRY)
    assert set(graded) | set(extra) == set(full)
    assert not set(graded) & set(extra)


_BROADCAST_ALLOWLIST = {
    # Every F.broadcast( call site must broadcast a PROVABLY bounded
    # table (SCALE.md rule 4). Adding a new site means adding it here —
    # with a bounded-size justification.
    "core/snapshot.py": 2,       # per-column category maps (bounded by encode cardinality cap)
    "core/preprocess.py": 1,     # one-hot category map (bounded)
    "functions/queries.py": 1,   # rank-parity corpus (100 rows by construction)
    "plans/relational.py": 4,    # nation (25) / region (5)
    "plans/relational_ext.py": 3, # nation / region + q44's per-event-type robust-bounds table (|event_types| rows)
    "operators/dedup.py": 1,     # simhash 32-row bit table
    "operators/similarity.py": 13, # 5-query sets + 16/32-row plane tables + IVF probe set (|queries|·nprobe rows) + PQ ADC query batch with its m*k-entry LUT columns (|queries| rows) + hard-negative query batch + benchmark suite for semantic decontamination (both bounded-set contracts) + cluster-balance rates (|clusters| rows) + margin_topk's query set (|queries| rows) and candidate set (|queries|·k rows) + ivf_recall_report's sampled-query batch (sample_mod contract) and its 1-row n_queries aggregate
    "operators/ivfpq.py": 3,     # query batch with per-query LUTs (bounded query set) + the same batch for the shortlist exact re-rank join + the residual searcher's per-(query, probed-list) LUT batch (nprobe x query set, bounded)
    "operators/sampling.py": 3,  # mixture rates (|sources| rows) + temperature share total (1 row) + DSIR per-bucket log-ratio table (<= buckets rows, 4096 default; its grand totals moved driver-side with the bounded collects)
    "ml/monitor.py": 3,          # PSI per-feature span/total tables (k rows
                                 # each) + KS shard offsets (≤ n_shards rows)
    "operators/text.py": 18,     # langid lexicon (24 rows), benchmark grams (eval-suite-sized), count-min sketch (<= depth*width = 4096 cells), token-budget shard offsets (<= n_sources * n_shards rows), shuffle-order shard counts (<= n_shards rows), BM25 query-term set (bounded by the query batch, the operator's documented contract) + 1-row corpus-stats aggregate + query-vocab df table (<= |query vocab| rows), bigram-LM type total x2 (1-row aggregates), trigram-LM bigram-type total (1-row aggregate), hybrid-RRF query-embedding batch (bounded by the query-set cap), ranked_by partition-offset table (<= n_shards rows), ccnet-bucket per-group counts (|groups| rows), bm25_index_search's query-term set + 1-row stats aggregate + probed df table (all bounded by the query batch, the same three bounds as the per-call BM25 sites) + the joined degrade path's 1-row stats aggregate
    "streaming/events.py": 1,  # streaming_curate's benchmark gram set (eval-suite-sized, the text_decontaminate bound)
    "ml/pergroup.py": 1,         # per-group coefficient table (|groups| rows; serve_per_group documents the broadcast-size contract — callers with ~10^7+ groups should join unhinted)
    "operators/pipeline.py": 1,  # composed pipeline's benchmark gram set (eval-suite-sized, same bound as text_decontaminate's)
    "operators/profile.py": 2,   # per-source doc-count table (|sources| rows, same bound as the mixture rates broadcast) + grouped_exact_quantiles' per-round ranges table (|groups| x |ps| rows, the operator's documented dataset-card-grain bound)
    "operators/qualityclf.py": 1,  # 1-row percentile-bounds aggregate (scalar fan-in for the seed-label selection)
    "operators/packing.py": 2,   # prefix-sum partition-offset table (<= n_shards rows, the ranked_by bound) + epoch table (|sources| rows, the mixture-rates bound)
}


def test_no_unbounded_broadcasts():
    """SCALE.md rule 4: broadcast what is constant-size, AQE what is
    ratio-sized. Round 2 shipped forced broadcasts of the (unbounded)
    token-vocabulary tables in text_unigram_logprob / text_tfidf_top_term;
    this pins every broadcast call site to an audited allowlist so an
    unbounded-table broadcast can't slip in silently."""
    actual: dict[str, int] = {}
    for p in (REPO / "quackml_spark").rglob("*.py"):
        n = p.read_text().count("F.broadcast(")
        if n:
            actual[str(p.relative_to(REPO / "quackml_spark"))] = n
    assert actual == _BROADCAST_ALLOWLIST, (
        "broadcast call sites changed — audit each new site for bounded "
        f"size and update the allowlist.\nactual={actual}"
    )


def test_no_global_window_orderby_in_engine():
    """SCALE.md rule 1: a Window.orderBy without partitionBy funnels all
    rows through one task — banned from the engine source."""
    offenders = []
    for p in (REPO / "quackml_spark").rglob("*.py"):
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if "Window.orderBy(" in line.replace(" ", ""):
                offenders.append(f"{p.relative_to(REPO)}:{i}")
    assert not offenders, offenders


def test_every_query_has_doc():
    undocumented = [n for n, q in sorted(REGISTRY.items()) if not q.doc]
    assert not undocumented, undocumented


def test_describe_matches_registry(spark):
    from quackml_spark.plans import describe

    df = describe(spark)
    assert df.count() == len(REGISTRY)
    assert df.where("oracle_checked").count() == sum(
        1 for q in REGISTRY.values() if q.oracle
    )


def test_oracle_outputs_never_hugeint():
    """Driver hazard: DuckDB types SUM(BIGINT) as HUGEINT, which pandas
    renders as float64/object and defeats the driver's value hash even
    when every cell matches (burned us on dedup_simhash and
    embedding_quantize_int8 in round 1). Every oracle's *output* columns
    must resolve to driver-hashable types — wrap integer SUMs in
    CAST(... AS BIGINT)."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for tname in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {tname} AS "
            f"SELECT * FROM read_parquet('{sf}/{tname}.parquet')"
        )
    offenders = []
    for name, q in sorted(REGISTRY.items()):
        if not q.oracle:
            continue
        try:
            rel = con.sql(q.oracle)
        except Exception as e:  # surfaced separately by parity tests
            offenders.append((name, f"oracle does not parse: {e}"))
            continue
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                offenders.append((name, f"{col} is {typ}"))
    assert not offenders, offenders


def test_load_all_reports_broken_module(monkeypatch):
    """A query module that fails to import must abort loudly, not
    silently shrink the scored registry (plans/__init__ collects and
    raises)."""
    import quackml_spark.plans as plans

    monkeypatch.setattr(plans, "_LOADED", False)
    monkeypatch.setattr(
        plans, "_QUERY_MODULES",
        plans._QUERY_MODULES + ("quackml_spark.__no_such_module__",),
    )
    import pytest as _pytest

    with _pytest.raises(ImportError, match="no_such_module"):
        plans._load_all()
    # un-poison for subsequent tests
    monkeypatch.undo()
    plans._LOADED = False
    plans._load_all()
    assert plans._LOADED
