"""Lineage truncation for iterative DataFrame loops.

``Dataset.localCheckpoint`` in Spark 4.1 stores the checkpointed rows but
keeps a LAZY stats/constraints rewrite referencing the origin plan
(``LogicalRDD$.rewriteStatsAndConstraints``, ExistingRDD.scala — observed
live in a jstack of the stuck driver). In an iterative loop whose body
SELF-JOINS the previous iteration's checkpoint (pointer jumping,
label propagation), forcing those stats walks the whole checkpoint
chain, and the self-join's deduplicated clone re-copies the unforced
thunk — so the walk doubles per generation. Measured on this host: a
50-row self-join + localCheckpoint loop runs ~0.2 s/iteration flat
until ~iteration 18, then grows ~2.5x per iteration (132 s by
iteration 25) with CONSTANT job, task, and partition counts — pure
driver-side planning time, while fresh unrelated jobs stay at 0.1 s.
Joining a STATIC relation instead stays flat for 40+ iterations
(single shared stats instance, forced once), which is why the repo's
bounded-round operators (connected components, PageRank) never hit
this. Disabling constraint propagation does not help; there is no
stats off-switch for the default SizeInBytesOnlyStatsPlanVisitor.

:func:`truncate_lineage` breaks the chain: it re-wraps the query's
execution RDD (``queryExecution.toRdd``) in a fresh LogicalRDD with NO
origin reference (``SparkSession.internalCreateDataFrame`` — a
``private[sql]`` API, public in bytecode, stable across Spark 3.x/4.x;
guarded by a fallback to plain ``localCheckpoint`` should it move).
The re-verified loop runs 40 self-join iterations flat at ~0.2 s.
Cost of losing origin stats: the planner sees default sizeInBytes, so
tiny relations are not broadcast at PLAN time — AQE re-plans the join
from actual shuffle sizes at runtime, which these iterative loops rely
on anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Local-checkpoint ``df`` and return a DataFrame whose plan is a
    bare LogicalRDD with no origin-plan reference (see module doc).

    With ``eager=False`` the checkpoint RDD is only marked; the first
    action over the returned frame materializes it — use when the
    caller's next action (a convergence ``count()``) should ride the
    same job.

    Implementation note: the raw ``queryExecution.toRdd()`` iterator
    REUSES UnsafeRow buffers, so wrapping it directly would alias every
    stored row in a partition to the last one. ``Dataset.localCheckpoint``
    inserts the required per-row copy before storage — so we let it do
    the copy + store, then discard its Dataset (whose LogicalRDD holds
    the problematic origin-stats thunk) and re-wrap the materialized
    checkpoint RDD in a bare LogicalRDD.
    """
    spark = df.sparkSession
    ck = df.localCheckpoint(eager=eager)
    try:
        qe = ck._jdf.queryExecution()
        out = DataFrame(
            spark._jsparkSession.internalCreateDataFrame(
                qe.toRdd(), qe.analyzed().schema(), False
            ),
            spark,
        )
    except Exception:  # pragma: no cover - internal API moved
        out = ck
    return out
