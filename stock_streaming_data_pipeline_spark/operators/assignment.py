"""Min-cost bipartite assignment — per-group combinatorial optimization.

The Hungarian algorithm in its potentials form (Kuhn 1955; the O(n^2 m)
shortest-augmenting-path formulation), exact over integer costs. In the
catalog it runs per bounded group via ``applyInPandas`` — the
category-(b) custom-operator path, like the WIS DP, but a different
problem class: global combinatorial matching, not a sequential
recurrence, so no window/aggregate composition can express it.

The catalog oracle does NOT share this implementation: it brute-forces
every injective assignment (<= P(6,6) = 720 permutations per group), so
each driver run cross-checks the Hungarian against exhaustive
enumeration — the strongest witness class available.
"""

from __future__ import annotations

_INF = 1 << 62


def min_cost_assignment(cost: list[list[int]]) -> int:
    """Exact minimum total cost of an injective assignment of every row
    to a distinct column; requires ``len(cost) <= len(cost[0])``.
    Integer costs only — the potentials stay integers, so the result is
    exact (no float comparisons anywhere)."""
    n = len(cost)
    if n == 0:
        return 0
    m = len(cost[0])
    if n > m:
        raise ValueError("rows must not outnumber columns")
    u = [0] * (n + 1)
    v = [0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row matched to column j (1-indexed)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [_INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = _INF
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    return -v[0]


def brute_force_assignment(cost: list[list[int]]) -> int:
    """Exhaustive reference: min over all injective row->column maps.
    Exponential — oracle/test use only (matrices <= 6x8)."""
    from itertools import permutations

    n = len(cost)
    if n == 0:
        return 0
    m = len(cost[0])
    best = _INF
    for perm in permutations(range(m), n):
        total = sum(cost[i][perm[i]] for i in range(n))
        if total < best:
            best = total
    return best
