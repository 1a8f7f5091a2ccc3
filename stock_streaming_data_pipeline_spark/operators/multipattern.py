"""Aho-Corasick multi-pattern matching — the large-dictionary path.

plans/llmdata.py:text_multipattern_match realizes bounded-dictionary
matching relationally (pattern explode + native replace-and-measure);
this module is the documented ESCAPE HATCH for dictionaries large enough
that the |patterns|-fold row fan-out loses to a single-pass automaton:
the classic Aho & Corasick (CACM 1975) goto/fail/output automaton, built
once driver-side (the dictionary is bounded — it is broadcast state, not
data), applied per Arrow batch via ``mapInPandas``. The catalog registers
both paths against the SAME oracle, so the differential proves the
automaton and the relational plan agree match-for-match.

Counting contract: NON-overlapping occurrence count per pattern (the
``replace``-and-measure semantics of the relational twin). A raw AC
automaton reports ALL matches including self-overlapping ones; the two
counts coincide exactly when no pattern has a proper border (a
non-empty proper prefix that is also a suffix), which ``build`` asserts
— for bordered patterns the counts would genuinely differ and the
caller must pick a semantics first.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable, Iterator


def _has_border(p: str) -> bool:
    return any(p[:k] == p[-k:] for k in range(1, len(p)))


class Automaton:
    """Goto/fail/output trie over the pattern set (plain dicts — the
    dictionary is bounded, so driver-side build cost is negligible and
    the object pickles into the Arrow workers like any closure)."""

    def __init__(self, patterns: list[str]):
        for p in patterns:
            if not p:
                raise ValueError("empty pattern")
            if _has_border(p):
                raise ValueError(
                    f"pattern {p!r} has a proper border: overlapping-match "
                    "count would differ from the non-overlapping contract"
                )
        self.patterns = list(patterns)
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(patterns):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(idx)
        # BFS failure links; outputs propagate along them
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0)
                if self.fail[t] == t:
                    self.fail[t] = 0
                self.out[t] = self.out[t] + self.out[self.fail[t]]

    def counts(self, text: str) -> list[int]:
        """Non-overlapping occurrence count per pattern (single pass)."""
        n = len(self.patterns)
        cnt = [0] * n
        # last end position per pattern, for the non-overlap rule
        last_end = [-1] * n
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for idx in self.out[s]:
                start = i - len(self.patterns[idx]) + 1
                if start > last_end[idx]:
                    cnt[idx] += 1
                    last_end[idx] = i
        return cnt


def match_counts_map_in_pandas(
    df,
    patterns: Iterable[str],
    *,
    text_col: str,
    group_col: str,
):
    """``(pattern, <group_col>, occ)`` — one row per (doc, pattern),
    INCLUDING occ = 0 rows, so downstream aggregation matches the
    relational twin's full pattern x group grid exactly."""
    import pandas as pd

    pats = list(patterns)
    aut = Automaton(pats)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_p, rows_g, rows_o = [], [], []
            for txt, grp in zip(pdf[text_col], pdf[group_col]):
                cnts = aut.counts(txt)
                rows_p.extend(pats)
                rows_g.extend([grp] * len(pats))
                rows_o.extend(cnts)
            yield pd.DataFrame(
                {"pattern": rows_p, group_col: rows_g, "occ": rows_o}
            )

    return df.select(text_col, group_col).mapInPandas(
        gen, schema=f"pattern string, {group_col} string, occ long"
    )
