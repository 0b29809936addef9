"""SQL front-end: the reference's table-function statements on Spark.

A user of the reference writes ``SELECT * FROM train('My Project',
task => 'regression', relation_name => 'tbl', y_column_name => 'y')``.
This module gives that surface without a Catalyst parser extension
(SURVEY §4.3 v1 decision): ``execute(spark, sql)`` recognizes the
quackml table functions — train / finetune / load_dataset / deploy —
parses the DuckDB-style named arguments (``name => value``), dispatches
to the Python API, and returns the reference-shaped one-row result.
Any other statement passes through to ``spark.sql`` unchanged (where
the registered scalar UDFs — quackml_predict / quackml_embed / ... —
already provide the scalar surface).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from quackml_spark.catalog import Catalog
from quackml_spark.session import local_rows

_FN_RE = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+(train|finetune|load_dataset|deploy|pipeline)\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_args(argstr: str) -> list[str]:
    """Split on top-level commas, respecting quotes and {}/[]/() nesting."""
    parts, depth, in_str, cur = [], 0, False, []
    i = 0
    while i < len(argstr):
        ch = argstr[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                if i + 1 < len(argstr) and argstr[i + 1] == "'":  # escaped ''
                    cur.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch in "{[(":
            depth += 1
            cur.append(ch)
        elif ch in "}])":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def _parse_value(v: str):
    v = v.strip()
    if v.startswith("'") and v.endswith("'"):
        s = v[1:-1].replace("''", "'")
        # JSON payloads (hyperparams, search_params, preprocess) arrive
        # as string literals in the reference too — decode when they
        # parse as JSON objects/arrays
        t = s.strip()
        if t[:1] in "{[":
            try:
                return json.loads(t)
            except json.JSONDecodeError:
                return s
        return s
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def _parse_call(argstr: str) -> tuple[list, dict]:
    args, kwargs = [], {}
    for part in _split_args(argstr):
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*=>\s*(.*)$", part, re.DOTALL)
        if m:
            kwargs[m.group(1).lower()] = _parse_value(m.group(2))
        else:
            args.append(_parse_value(part))
    return args, kwargs


_SCALAR_REWRITES = {
    "predict": "quackml_predict",
    "embed": "quackml_embed",
    "transform": "quackml_transform",
    "generate": "quackml_generate",
    "chunk": "quackml_chunk",
}
_SCALAR_RE = re.compile(
    r"\b(" + "|".join(_SCALAR_REWRITES) + r")\s*\(", re.IGNORECASE
)


def _rewrite_scalars(sql: str) -> str:
    """Map the reference's bare scalar names (predict(...), embed(...))
    onto the registered quackml_* UDFs, skipping string literals."""
    out, last = [], 0
    # protect single-quoted AND double-quoted literals: Spark's default
    # parser (doubleQuotedIdentifiers=false) treats "..." as a string
    # literal too, and rewriting inside one silently altered user data
    # (review catch)
    for m in re.finditer(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"", sql):
        seg = sql[last : m.start()]
        out.append(_SCALAR_RE.sub(lambda g: _SCALAR_REWRITES[g.group(1).lower()] + "(", seg))
        out.append(m.group(0))
        last = m.end()
    out.append(_SCALAR_RE.sub(lambda g: _SCALAR_REWRITES[g.group(1).lower()] + "(", sql[last:]))
    return "".join(out)


def execute(
    spark: SparkSession, sql: str, catalog: Catalog | None = None
) -> DataFrame:
    """Run one statement; quackml table functions dispatch to the Python
    API, everything else goes to ``spark.sql`` with the reference's bare
    scalar names rewritten onto the registered quackml_* UDFs."""
    m = _FN_RE.match(sql)
    if not m:
        return spark.sql(_rewrite_scalars(sql))
    fn, argstr = m.group(1).lower(), m.group(2)
    args, kw = _parse_call(argstr)
    catalog = catalog or Catalog()

    def _first(*names: str) -> str:
        """First positional arg, else the first matching named arg
        (the reference accepts both call shapes); loud error otherwise."""
        if args:
            return args[0]
        for n in names:
            if n in kw:
                return kw.pop(n)
        raise ValueError(
            f"{fn}(...) needs a {' / '.join(names)} argument, positional "
            f"or named; got args={args} kwargs={sorted(kw)}"
        )

    def _rest(*names: str) -> None:
        """Map positional args after the first onto ``names`` (the
        reference's positional call shape), then REFUSE leftovers: the
        earlier behavior silently dropped args[1:], so
        train('p','regression','tbl','y') trained a default-task model
        on the wrong relation without any error (review catch)."""
        for i, n in enumerate(names, start=1):
            if len(args) > i:
                if n in kw:
                    raise ValueError(
                        f"{fn}(...): argument {n!r} given both "
                        f"positionally and by name"
                    )
                kw[n] = args[i]
        if len(args) > 1 + len(names):
            raise ValueError(
                f"{fn}(...) got {len(args) - 1 - len(names)} extra "
                f"positional argument(s) beyond ({', '.join(names)})"
            )

    if fn == "train":
        from quackml_spark.ml import train

        _rest("task", "relation_name", "y_column_name")
        res = train(spark, _first("project", "project_name"), catalog=catalog, **kw)
        return local_rows(
            spark,
            [(res.project, res.task, res.algorithm, bool(res.deployed))],
            "project string, task string, algorithm string, deployed boolean",
        )
    if fn == "finetune":
        from quackml_spark.ml.finetune import finetune

        _rest("task", "relation_name", "y_column_name")
        res = finetune(
            spark, _first("project", "project_name"), catalog=catalog, **kw
        )
        return local_rows(
            spark,
            [("OK", res.task, res.algorithm, bool(res.deployed))],
            "status string, task string, algorithm string, deployed boolean",
        )
    if fn == "pipeline":
        # generic table-function access to the ENTIRE registered
        # operator surface: SELECT * FROM pipeline('dedup_semantic',
        # sf_dir => '/data/sf0.01') — beyond the reference's four table
        # functions, making every engine operator SQL-callable.
        from quackml_spark.plans import REGISTRY, _load_all

        _load_all()
        name = _first("name", "query")
        if name not in REGISTRY:
            import difflib

            close = difflib.get_close_matches(name, REGISTRY, n=3)
            raise ValueError(
                f"pipeline({name!r}): unknown query; did you mean {close}? "
                f"(see quackml_spark.plans.describe for the full surface)"
            )
        # positional-or-named, like every other table function here
        sf_dir = args[1] if len(args) > 1 else kw.pop("sf_dir", None)
        if sf_dir is None:
            raise ValueError(
                "pipeline(...) needs the data directory: "
                "pipeline('<query>', sf_dir => '/path/to/sf') or "
                "pipeline('<query>', '/path/to/sf')"
            )
        if kw:
            raise ValueError(f"pipeline(...) got unknown arguments {sorted(kw)}")
        return REGISTRY[name].builder(spark, sf_dir)
    if fn == "load_dataset":
        from quackml_spark.ml import load_dataset

        _rest()
        df = load_dataset(spark, _first("source", "source_name", "name"), **kw)
        return local_rows(spark, [(df.count(),)], "rows bigint")
    # deploy(project, strategy[, model_id]) — positional or named args
    from quackml_spark.ml import deploy

    project = _first("project", "project_name")
    dep_kw = dict(kw)
    if len(args) > 1:
        dep_kw.setdefault("strategy", args[1])
    if len(args) > 2:
        dep_kw.setdefault("model_id", args[2])
    model_id = deploy(project, catalog=catalog, **dep_kw)
    return local_rows(
        spark, [(project, int(model_id))], "project string, model_id long"
    )
