"""Weighted interval scheduling — the classic per-key sequential DP.

The one operator class in the catalog whose recurrence is genuinely
order-dependent per key (OPT(j) looks back at OPT(p(j))), so it cannot be
a window/aggregate composition: the Spark-first realization is the
documented category-(b) custom-operator path — ``applyInPandas`` over the
grouping key, with the group-local DP in plain Python over Arrow batches.
Group sizes are bounded by per-key interval counts (orders per customer),
so no task ever sees more than one key's intervals.

The DP itself lives here so the Spark worker and the DuckDB-side
literal-VALUES oracle (plans/mlstats.py) import the SAME implementation —
the cross-engine differential then checks the distributed plumbing
(grouping, Arrow round-trip, ordering), which is exactly the part Spark
owns.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterable


def weighted_interval_best(
    items: Iterable[tuple[int, int, int]],
) -> tuple[int, int]:
    """Max-total-weight non-overlapping subset of ``(start, end, weight)``
    intervals (all exact ints). Returns ``(best_total, n_selected)``.

    Textbook DP (Kleinberg & Tardos §6.1): sort by end; p(j) = number of
    intervals ending at or before start_j; OPT(j) = max(OPT(j-1),
    w_j + OPT(p(j))). Compatibility is end <= start (an interval may
    begin the instant another ends). The reconstruction prefers SKIPPING
    on exact ties (strict > when taking), so ``n_selected`` is a
    deterministic function of the sorted input — the property the
    cross-engine oracle relies on.
    """
    rows = sorted(items, key=lambda r: (r[1], r[0], r[2]))
    n = len(rows)
    ends = [r[1] for r in rows]
    p = [0] * (n + 1)
    opt = [0] * (n + 1)
    for j in range(1, n + 1):
        p[j] = bisect.bisect_right(ends, rows[j - 1][0])
        take = rows[j - 1][2] + opt[p[j]]
        opt[j] = take if take > opt[j - 1] else opt[j - 1]
    n_sel = 0
    j = n
    while j > 0:
        if rows[j - 1][2] + opt[p[j]] > opt[j - 1]:
            n_sel += 1
            j = p[j]
        else:
            j -= 1
    return opt[n], n_sel
