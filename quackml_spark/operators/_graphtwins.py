"""SQL twins shared by graph.py and dedup.py oracle builders.

Both modules register queries at import time whose oracles need the
other module's twins (q40 replays dedup's band CTEs; the composed
ppjoin_best replays LPA's rounds). Keeping the LPA round twin in this
leaf module breaks the import cycle those module-level registrations
would otherwise form.
"""

from __future__ import annotations


def lpa_round_ctes(iters: int) -> list[str]:
    """The unrolled synchronous-LPA round CTEs (l0..lN) over an
    existing ``und``(s, d) undirected-edge CTE — the oracle twin of
    label_propagation's loop body, shared by the band-graph replay
    (q40) and curate()'s ppjoin_best composed replay so the two can
    never drift."""
    ctes = ["l0 AS (SELECT DISTINCT s AS node, s AS label FROM und)"]
    for t in range(1, iters + 1):
        ctes.append(
            f"""l{t} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT u.s AS node, l.label, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (
             PARTITION BY u.s ORDER BY COUNT(*) DESC, l.label ASC) AS rn
    FROM und u JOIN l{t - 1} l ON l.node = u.d
    GROUP BY u.s, l.label
  ) WHERE rn = 1
)"""
        )
    return ctes
