"""Shared sketch closures for the pandas path.

One Misra-Gries implementation serves both the batch operator
(``operators/pipeline6.sketch_frequent_items``) and the streaming
maintainer (``streaming/sketch.mg_stream``) — two hand-maintained copies
of the decrement-all loop drifted once (a NULL-key crash fixed in one
would have silently missed the other).

The factory returns a NESTED function so cloudpickle serializes it BY
VALUE (captured cells included): a vanilla session's Python workers never
need to import this package. The factory itself runs driver-side only.
"""

from __future__ import annotations


def mg_partials_closure(k: int, col: str):
    """Per-partition Misra-Gries summary generator for ``mapInPandas``:
    ≤ ``k`` counters, O(1) memory per task, classic decrement-all step.
    NULL keys are EXCLUDED from counting (a None dict key would crash the
    sorted-JSON persistence downstream, and a null has no frequency
    semantics). Per-partition bound true_p − est_p ≤ n_p/(k+1) sums
    across partitions (mergeable summaries), giving the merged n/(k+1)
    bound under any partitioning."""

    def mg_partials(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t in pdf[col]:
                if t is None:
                    continue
                c = counters.get(t)
                if c is not None:
                    counters[t] = c + 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for k2 in counters:
                        v = counters[k2] - 1
                        if v:
                            counters[k2] = v
                        else:
                            dead.append(k2)
                    for k2 in dead:
                        del counters[k2]
        if counters:
            yield pd.DataFrame(
                {
                    col: list(counters.keys()),
                    "est": [int(v) for v in counters.values()],
                }
            )
        else:
            yield pd.DataFrame(
                {col: pd.Series(dtype="object"), "est": pd.Series(dtype="int64")}
            )

    return mg_partials
