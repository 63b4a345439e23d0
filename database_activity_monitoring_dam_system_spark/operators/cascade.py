"""FK delete-propagation (SURVEY.md J5) as a batch analytics job.

The reference declares referential actions in the schema and lets
InnoDB enforce them row-by-row (sql/02_create_tables.sql:46
``activity_logs.user_id ... ON DELETE SET NULL``, :63
``security_alerts.activity_id ... ON DELETE CASCADE``, :90
``compliance_logs.activity_id ... ON DELETE CASCADE``). A columnar
lakehouse has no in-scan FK machinery, so the same semantics run as a
set-oriented propagation pass over the affected tables — the standard
GDPR-deletion / retention-job shape:

  * SET NULL  → left join the fact against the deleted-parent key set
                and null the FK column on match (parent row survives
                nowhere, the child row survives with the FK cleared);
  * CASCADE   → anti-join the child on the deleted-parent key set.

Scale notes: the deleted-key set is usually dimension-sized (user
deletions) → broadcast; activity-level deletions (retention windows)
can be arbitrarily large → plain anti-join on the FK, which AQE plans
as broadcast or shuffled-hash by observed size. Neither path sorts and
neither touches rows outside the join keys, so the pass is one shuffle
worst-case per child table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key_set(keys: DataFrame, key_col: str, renamed: str) -> DataFrame:
    return keys.select(F.col(key_col).alias(renamed)).where(
        F.col(renamed).isNotNull()
    ).distinct()


def set_null_on_delete(
    child: DataFrame,
    deleted_parents: DataFrame,
    *,
    fk_col: str,
    parent_key: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """ON DELETE SET NULL: null ``child.fk_col`` where the parent key
    was deleted (activity_logs.user_id, 02_create_tables.sql:46).

    Only the FK column changes — denormalized copies (e.g. username)
    are untouched, exactly as InnoDB leaves non-FK columns alone.
    """
    marker = f"__deleted_{fk_col}"
    keys = _key_set(deleted_parents, parent_key or fk_col, marker)
    if broadcast:
        keys = F.broadcast(keys)
    fk_type = dict(child.dtypes)[fk_col]
    return (
        child.join(keys, child[fk_col] == keys[marker], "left")
        .withColumn(
            fk_col,
            F.when(F.col(marker).isNotNull(), F.lit(None).cast(fk_type))
            .otherwise(F.col(fk_col)),
        )
        .drop(marker)
    )


def cascade_on_delete(
    child: DataFrame,
    deleted_parents: DataFrame,
    *,
    fk_col: str,
    parent_key: str | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """ON DELETE CASCADE: drop child rows whose FK points at a deleted
    parent (security_alerts / compliance_logs on activity_id,
    02_create_tables.sql:63,90). NULL FKs survive — InnoDB only
    cascades matched references.
    """
    marker = f"__deleted_{fk_col}"
    keys = _key_set(deleted_parents, parent_key or fk_col, marker)
    if broadcast:
        keys = F.broadcast(keys)
    return child.join(
        keys, child[fk_col] == keys[marker], "left_anti"
    )


def propagate_deletes(
    activity: DataFrame,
    *,
    deleted_users: DataFrame | None = None,
    deleted_activities: DataFrame | None = None,
    children: dict[str, DataFrame] | None = None,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Full J5 pass: apply a user-deletion set and an activity-deletion
    set to ``activity_logs`` and its cascade children in FK order.

    Returns the propagated activity table and the propagated children
    (``security_alerts``-shaped frames keyed by name). Activity rows
    deleted directly AND rows referencing deleted users both follow the
    schema's actions: the former cascade into the children, the latter
    merely lose their user_id.
    """
    out = activity
    if deleted_activities is not None:
        out = cascade_on_delete(
            out, deleted_activities, fk_col="activity_id"
        )
    if deleted_users is not None:
        out = set_null_on_delete(
            out, deleted_users, fk_col="user_id"
        )
    propagated: dict[str, DataFrame] = {}
    for name, child in (children or {}).items():
        if deleted_activities is not None:
            child = cascade_on_delete(
                child, deleted_activities, fk_col="activity_id"
            )
        propagated[name] = child
    return out, propagated
