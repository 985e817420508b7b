"""Referential-integrity check: keys with no match in a dimension table.

The distributed generalization of the reference's required-key set algebra
(typic/constraints/mapping.py:228-235 `issuperset` on key sets) — here the
"required set" is a dimension table that may itself be huge.

Scale design: LEFT ANTI join on the key. When the dimension is small
(conversations dim ~ n_turns/20 keys, but each row is tiny) we broadcast
it explicitly — zero shuffle of the 100 TB fact side. When it is too big
to broadcast, we drop the hint and let AQE pick sort-merge with skew-join
splitting (spark.sql.adaptive.skewJoin.enabled is on in session.py);
distinct-ing the dim's key first shrinks the build side either way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Sequence[str] | None = None,
    broadcast_dim: bool = True,
    null_is_violation: bool = False,
) -> DataFrame:
    """Rows of `fact` whose key has no match in `dim`.

    NULL keys are skipped by default (they are NotNullCheck's business,
    mirroring the reference's nullable short-circuit common.py:272-287).
    """
    dim_keys = list(dim_keys or fact_keys)
    fact_keys = list(fact_keys)
    keyed_dim = dim.select(
        *[F.col(d).alias(f) for d, f in zip(dim_keys, fact_keys)]
    ).dropDuplicates(fact_keys)
    if broadcast_dim:
        keyed_dim = F.broadcast(keyed_dim)
    probe = fact
    if not null_is_violation:
        cond = F.lit(True)
        for k in fact_keys:
            cond = cond & F.col(k).isNotNull()
        probe = fact.where(cond)
    return probe.join(keyed_dim, fact_keys, "left_anti")
