"""Evaluation metrics — parity with the reference's inventory (§2.10).

Regression {r2, mae, mse, rmse}; classification {f1 (macro), f1_micro,
precision, recall, accuracy, mcc, roc_auc (binary), log_loss};
clustering {silhouette}; decomposition {cumulative_explained_variance}.

The confusion-matrix-derived metrics mirror metrics.rs:35-186: the
matrix is built distributed via groupBy(label, prediction).count() and
only the k×k cell counts come to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from quackml_spark.session import local_rows


def confusion_matrix(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction"):
    rows = (
        pred.groupBy(
            F.col(label_col).cast("double").alias("y"),
            F.col(pred_col).cast("double").alias("p"),
        )
        .count()
        .collect()
    )
    classes = sorted({r["y"] for r in rows} | {r["p"] for r in rows})
    idx = {c: i for i, c in enumerate(classes)}
    k = len(classes)
    m = [[0] * k for _ in range(k)]
    for r in rows:
        m[idx[r["y"]]][idx[r["p"]]] += r["count"]
    return m, classes


def classification_metrics(
    pred: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> dict:
    m, classes = confusion_matrix(pred, label_col, pred_col)
    k = len(classes)
    total = sum(sum(row) for row in m)
    tp = [m[i][i] for i in range(k)]
    fp = [sum(m[r][i] for r in range(k)) - m[i][i] for i in range(k)]
    fn = [sum(m[i][c] for c in range(k)) - m[i][i] for i in range(k)]

    def safe(n, d):
        return n / d if d else 0.0

    precisions = [safe(tp[i], tp[i] + fp[i]) for i in range(k)]
    recalls = [safe(tp[i], tp[i] + fn[i]) for i in range(k)]
    f1s = [safe(2 * p * r, p + r) for p, r in zip(precisions, recalls)]
    accuracy = safe(sum(tp), total)
    micro_p = safe(sum(tp), sum(tp) + sum(fp))
    micro_r = safe(sum(tp), sum(tp) + sum(fn))
    out = {
        "accuracy": accuracy,
        "f1": sum(f1s) / k if k else 0.0,  # macro (metrics.rs macro f1)
        "f1_micro": safe(2 * micro_p * micro_r, micro_p + micro_r),
        "precision": sum(precisions) / k if k else 0.0,
        "recall": sum(recalls) / k if k else 0.0,
    }
    # Matthews correlation coefficient (multiclass generalization)
    s = total
    c = sum(tp)
    t = [sum(m[i][j] for j in range(k)) for i in range(k)]  # actual per class
    p = [sum(m[i][j] for i in range(k)) for j in range(k)]  # predicted per class
    num = c * s - sum(ti * pi for ti, pi in zip(t, p))
    den = math.sqrt(s * s - sum(pi * pi for pi in p)) * math.sqrt(
        s * s - sum(ti * ti for ti in t)
    )
    out["mcc"] = num / den if den else 0.0
    return out


def binary_extra_metrics(
    pred: DataFrame, label_col: str = "label", prob_col: str = "probability_arr"
) -> dict:
    """roc_auc (trapezoidal, metrics.rs:221-253) + log_loss — binary only,
    computed from the positive-class probability."""
    out = {}
    if prob_col not in pred.columns:
        return out
    scored = pred.select(
        F.col(label_col).cast("double").alias("y"),
        F.col(prob_col)[1].cast("double").alias("s"),
    ).where(F.col("s").isNotNull())
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    tmp = scored.withColumnRenamed("s", "rawPrediction")
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol="y", metricName="areaUnderROC"
    )
    out["roc_auc"] = float(ev.evaluate(tmp))
    eps = 1e-15
    ll = scored.select(
        F.when(
            F.col("y") == 1.0,
            -F.log(F.greatest(F.col("s"), F.lit(eps))),
        )
        .otherwise(-F.log(F.greatest(1.0 - F.col("s"), F.lit(eps))))
        .alias("l")
    ).agg(F.avg("l")).collect()[0][0]
    out["log_loss"] = float(ll) if ll is not None else None
    return out


def regression_metrics(
    pred: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> dict:
    # single pass: ss_tot via var_pop (Welford merge — stable) so the
    # model transform over the test split evaluates once, not twice
    agg = pred.select(
        F.col(label_col).cast("double").alias("y"),
        F.col(pred_col).cast("double").alias("p"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("y") - F.col("p")) ** 2).alias("ss_res"),
        F.avg(F.abs(F.col("y") - F.col("p"))).alias("mae"),
        F.var_pop("y").alias("vy"),
    ).collect()[0]
    ss_tot = (agg["vy"] or 0.0) * agg["n"] if agg["n"] else None
    mse = agg["ss_res"] / agg["n"] if agg["n"] else None
    return {
        "r2": 1.0 - agg["ss_res"] / ss_tot if ss_tot else 0.0,
        "mae": float(agg["mae"]) if agg["mae"] is not None else None,
        "mse": float(mse) if mse is not None else None,
        "rmse": math.sqrt(mse) if mse is not None else None,
    }


def clustering_metrics(pred: DataFrame, features_col: str = "features_vec") -> dict:
    from pyspark.ml.evaluation import ClusteringEvaluator

    ev = ClusteringEvaluator(featuresCol=features_col, predictionCol="prediction")
    return {"silhouette": float(ev.evaluate(pred))}


# ---------------------------------------------------------------------------
# Text-generation metric families (§2.10 tail): BLEU / ROUGE / QA-EM /
# perplexity. The reference computes these driver-side with sacrebleu,
# the `rouge` package, and torch NLL (transformers.py:650-880); none of
# that needs a neural runtime, so they are implemented here as pure
# functions (fixture-checkable) plus distributed DataFrame reducers —
# corpus BLEU is a sum of per-row clipped n-gram counts and ROUGE/EM/F1
# are per-row means, so both aggregate map-side at any scale.
# ---------------------------------------------------------------------------

import re as _re


def _bleu_13a_tokenize(text: str) -> list[str]:
    """mteval-v13a tokenization (sacrebleu's default `13a`)."""
    t = text
    t = t.replace("<skipped>", "")
    t = t.replace("-\n", "").replace("\n", " ")
    if "&" in t:
        t = (
            t.replace("&quot;", '"')
            .replace("&amp;", "&")
            .replace("&lt;", "<")
            .replace("&gt;", ">")
        )
    t = f" {t} "
    t = _re.sub(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])", r" \1 ", t)
    t = _re.sub(r"([^0-9])([\.,])", r"\1 \2 ", t)
    t = _re.sub(r"([\.,])([^0-9])", r" \1 \2", t)
    t = _re.sub(r"([0-9])(-)", r"\1 \2 ", t)
    return t.split()


def _ngram_counts(tokens: list[str], n: int) -> dict:
    out: dict[tuple, int] = {}
    for i in range(len(tokens) - n + 1):
        g = tuple(tokens[i : i + n])
        out[g] = out.get(g, 0) + 1
    return out


def bleu_sufficient_stats(pred: str, ref: str, max_order: int = 4) -> list[int]:
    """Per-pair clipped n-gram stats: [correct1..4, total1..4,
    pred_len, ref_len]. Summing these across a corpus and finishing with
    :func:`bleu_finish` reproduces sacrebleu `BLEU().corpus_score` for
    single-reference corpora — which is exactly how the reference scores
    summarization/translation finetunes (transformers.py:671,756)."""
    p = _bleu_13a_tokenize(pred or "")
    r = _bleu_13a_tokenize(ref or "")
    stats = []
    for n in range(1, max_order + 1):
        pc = _ngram_counts(p, n)
        rc = _ngram_counts(r, n)
        correct = sum(min(c, rc.get(g, 0)) for g, c in pc.items())
        stats.append(correct)
    totals = [max(len(p) - n + 1, 0) for n in range(1, max_order + 1)]
    return stats + totals + [len(p), len(r)]


def bleu_finish(stats: list[float], max_order: int = 4) -> float:
    """sacrebleu finalization: exp-smoothed precisions, brevity penalty,
    0-100 scale."""
    correct = stats[:max_order]
    total = stats[max_order : 2 * max_order]
    sys_len, ref_len = stats[2 * max_order], stats[2 * max_order + 1]
    precisions = [0.0] * max_order
    smooth = 1.0
    for n in range(max_order):
        if total[n] == 0:
            break
        if correct[n] == 0:
            smooth *= 2.0
            precisions[n] = 100.0 / (smooth * total[n])
        else:
            precisions[n] = 100.0 * correct[n] / total[n]
    if min(precisions) <= 0.0:
        return 0.0
    bp = 1.0 if sys_len >= ref_len else math.exp(1.0 - ref_len / max(sys_len, 1))
    return bp * math.exp(sum(math.log(p) for p in precisions) / max_order)


def bleu_corpus(preds: list[str], refs: list[str]) -> float:
    agg = [0.0] * 10
    for p, r in zip(preds, refs):
        for i, v in enumerate(bleu_sufficient_stats(p, r)):
            agg[i] += v
    return bleu_finish(agg)


def _rouge_pair(pred: str, ref: str) -> dict:
    """ROUGE-1/2 (unique-ngram overlap) + ROUGE-L (LCS) f/p/r for one
    pair — the `rouge` PyPI package semantics (exclusive n-gram sets)
    the reference feeds Rouge().get_scores(avg=True)."""
    eps = 1e-8
    pt = (pred or "").split()
    rt = (ref or "").split()
    out = {}
    for key, n in (("rouge-1", 1), ("rouge-2", 2)):
        pg = set(_ngram_counts(pt, n))
        rg = set(_ngram_counts(rt, n))
        hits = len(pg & rg)
        p = hits / max(len(pg), 1)
        r = hits / max(len(rg), 1)
        out[key] = {"f": 2 * p * r / (p + r + eps), "p": p, "r": r}
    # LCS length via one-row DP
    if pt and rt:
        prev = [0] * (len(rt) + 1)
        for a in pt:
            cur = [0]
            for j, b in enumerate(rt, 1):
                cur.append(prev[j - 1] + 1 if a == b else max(prev[j], cur[-1]))
            prev = cur
        lcs = prev[-1]
    else:
        lcs = 0
    p = lcs / max(len(pt), 1)
    r = lcs / max(len(rt), 1)
    out["rouge-l"] = {"f": 2 * p * r / (p + r + eps), "p": p, "r": r}
    return out


def generation_text_metrics(preds: list[str], refs: list[str]) -> dict:
    """The reference's summarization/translation metric dict
    (transformers.py:673-682): corpus BLEU + averaged ROUGE-1/2, with
    ROUGE-L added."""
    n = max(len(preds), 1)
    sums: dict[str, float] = {}
    for p, r in zip(preds, refs):
        for key, st in _rouge_pair(p, r).items():
            for k2, v in st.items():
                sums[f"{key}/{k2}"] = sums.get(f"{key}/{k2}", 0.0) + v
    return {
        "bleu": bleu_corpus(preds, refs),
        "rouge_ngram_f1": sums.get("rouge-1/f", 0.0) / n,
        "rouge_ngram_precision": sums.get("rouge-1/p", 0.0) / n,
        "rouge_ngram_recall": sums.get("rouge-1/r", 0.0) / n,
        "rouge_bigram_f1": sums.get("rouge-2/f", 0.0) / n,
        "rouge_bigram_precision": sums.get("rouge-2/p", 0.0) / n,
        "rouge_bigram_recall": sums.get("rouge-2/r", 0.0) / n,
        "rouge_lcs_f1": sums.get("rouge-l/f", 0.0) / n,
        "rouge_lcs_precision": sums.get("rouge-l/p", 0.0) / n,
        "rouge_lcs_recall": sums.get("rouge-l/r", 0.0) / n,
    }


_ARTICLES_RE = _re.compile(r"\b(a|an|the)\b")
_PUNCT_RE = _re.compile(r"[^\w\s]")


def normalize_text(s: str) -> str:
    """SQuAD answer normalization: lowercase, strip punctuation,
    articles, and redundant whitespace (the helper the reference's QA
    metrics assume, transformers.py:791-810)."""
    s = (s or "").lower()
    s = _PUNCT_RE.sub(" ", s)
    s = _ARTICLES_RE.sub(" ", s)
    return " ".join(s.split())


def qa_exact_match(prediction: str, truth: str) -> int:
    return int(normalize_text(prediction) == normalize_text(truth))


def qa_f1(prediction: str, truth: str) -> float:
    """Token-overlap F1 exactly as the reference defines it
    (transformers.py:794-810): unique common tokens over full token
    counts; empty-vs-empty agreement scores 1."""
    pred_tokens = normalize_text(prediction).split()
    truth_tokens = normalize_text(truth).split()
    if len(pred_tokens) == 0 or len(truth_tokens) == 0:
        return float(pred_tokens == truth_tokens)
    common = set(pred_tokens) & set(truth_tokens)
    if not common:
        return 0.0
    prec = len(common) / len(pred_tokens)
    rec = len(common) / len(truth_tokens)
    return 2 * prec * rec / (prec + rec)


def question_answering_metrics(preds: list[str], truths: list[str]) -> dict:
    n = max(len(preds), 1)
    return {
        "exact_match": sum(qa_exact_match(p, t) for p, t in zip(preds, truths)) / n,
        "f1": sum(qa_f1(p, t) for p, t in zip(preds, truths)) / n,
    }


def perplexity_from_logprobs(logprobs: list[float]) -> float:
    """perplexity = exp(mean NLL) — the reference's text-generation
    metric (transformers.py:836-880) with the per-token negative
    log-likelihoods supplied by the caller instead of a torch forward
    pass."""
    if not logprobs:
        return float("nan")
    return math.exp(-sum(logprobs) / len(logprobs))


def generation_metrics_df(df: DataFrame, pred_col: str, ref_col: str) -> dict:
    """Distributed corpus BLEU + averaged ROUGE over a predictions
    DataFrame: per-row sufficient stats in an Arrow batch UDF, one
    map-side-combined aggregation, scalar finish on the driver."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    schema = StructType(
        [StructField("bleu_stats", ArrayType(DoubleType()))]
        + [
            StructField(c, DoubleType())
            for c in ("r1f", "r1p", "r1r", "r2f", "r2p", "r2r", "rlf", "rlp", "rlr")
        ]
    )

    def _stats(preds, refs):
        rows = []
        for p, r in zip(preds, refs):
            rp = _rouge_pair(p, r)
            rows.append(
                {
                    "bleu_stats": [float(v) for v in bleu_sufficient_stats(p, r)],
                    "r1f": rp["rouge-1"]["f"], "r1p": rp["rouge-1"]["p"],
                    "r1r": rp["rouge-1"]["r"], "r2f": rp["rouge-2"]["f"],
                    "r2p": rp["rouge-2"]["p"], "r2r": rp["rouge-2"]["r"],
                    "rlf": rp["rouge-l"]["f"], "rlp": rp["rouge-l"]["p"],
                    "rlr": rp["rouge-l"]["r"],
                }
            )
        return pd.DataFrame(rows)

    stats_udf = F.pandas_udf(_stats, returnType=schema)
    st = df.select(stats_udf(F.col(pred_col), F.col(ref_col)).alias("s")).select("s.*")
    agg = st.agg(
        *[F.sum(F.col("bleu_stats")[i]).alias(f"b{i}") for i in range(10)],
        *[
            F.avg(c).alias(c)
            for c in ("r1f", "r1p", "r1r", "r2f", "r2p", "r2r", "rlf", "rlp", "rlr")
        ],
    ).collect()[0]
    return {
        "bleu": bleu_finish([float(agg[f"b{i}"] or 0.0) for i in range(10)]),
        "rouge_ngram_f1": float(agg["r1f"] or 0.0),
        "rouge_ngram_precision": float(agg["r1p"] or 0.0),
        "rouge_ngram_recall": float(agg["r1r"] or 0.0),
        "rouge_bigram_f1": float(agg["r2f"] or 0.0),
        "rouge_bigram_precision": float(agg["r2p"] or 0.0),
        "rouge_bigram_recall": float(agg["r2r"] or 0.0),
        "rouge_lcs_f1": float(agg["rlf"] or 0.0),
        "rouge_lcs_precision": float(agg["rlp"] or 0.0),
        "rouge_lcs_recall": float(agg["rlr"] or 0.0),
    }


def confusion_matrix_df(pred: DataFrame) -> DataFrame:
    """(label, prediction, n) counts — the confusion matrix AS a
    DataFrame (one groupBy, stays distributed; the tuple-returning
    ``confusion_matrix`` above is the driver-side variant the scorer
    uses)."""
    return (
        pred.groupBy(
            F.col("label").cast("double").alias("label"),
            F.col("prediction").cast("double").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )


def classification_report(pred: DataFrame) -> DataFrame:
    """Per-class precision/recall/f1/support from one confusion-matrix
    pass (sklearn.metrics.classification_report shape, distributed)."""
    # ONE distributed pass computes the k²-row matrix; rebuilding it as
    # a local relation lets the three downstream branches (support/
    # predicted/tp) reuse it with no cache entry at all — the earlier
    # .cache() was never unpersisted and leaked one CacheManager entry
    # per call (code-review catch), and unpersisting under the returned
    # lazy plan was the round-6 bug. k² rows is trivially driver-safe.
    rows = confusion_matrix_df(pred).collect()
    cm = local_rows(
        pred.sparkSession,
        [(r["label"], r["prediction"], r["n"]) for r in rows],
        "label double, prediction double, n bigint",
    )
    support = cm.groupBy(F.col("label").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    predicted = cm.groupBy(F.col("prediction").alias("cls")).agg(
        F.sum("n").alias("predicted_n")
    )
    tp = cm.where(F.col("label") == F.col("prediction")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    out = (
        support.join(predicted, "cls", "full")
        .join(tp, "cls", "left")
        .na.fill({"tp": 0, "support": 0, "predicted_n": 0})
        .select(
            "cls",
            (F.col("tp") / F.greatest("predicted_n", F.lit(1))).alias("precision"),
            (F.col("tp") / F.greatest("support", F.lit(1))).alias("recall"),
            "support",
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("cls")
    )
    return out
