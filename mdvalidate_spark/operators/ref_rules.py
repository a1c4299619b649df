"""Referential-integrity rules: broadcast left-anti joins.

Analog of the reference's link-destination validation (reference:
walkers/validators/links.rs:216-310 — a destination must match a literal or a
pattern; here a foreign-key value must exist in a dimension table). Dimension
tables are small by construction (format domains, source registries), so the
join side is broadcast — zero shuffle of the fact table, the anti-join runs
map-side inside the same scan stage as everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import KIND_ORPHAN
from ..spec import RefIntegrityRule


def ref_violations(
    df: DataFrame,
    rule: RefIntegrityRule,
    dim: DataFrame,
    run_id: str,
    key_column: str,
) -> DataFrame:
    """Rows of df whose rule.column has no match in dim.dim_column.

    NULL foreign keys are skipped (NotNullRule's job), matching left-anti
    NULL semantics explicitly rather than by accident.
    """
    fk = F.col(rule.column)
    if rule.when:
        df = df.where(F.expr(rule.when))  # scope-gated integrity
    dim_keys = dim.select(F.col(rule.dim_column).alias("__dim_key")).dropDuplicates()
    # broadcast_dim=False (huge dims — a 10^9-key registry cannot be
    # broadcast) leaves the join unhinted: AQE picks sort-merge/shuffled-hash
    # from the runtime sizes, with skew-join splitting on hot keys, or still
    # broadcasts if the deduped key set turns out small
    dim_side = F.broadcast(dim_keys) if rule.broadcast_dim else dim_keys
    orphans = (
        df.where(fk.isNotNull())
        .join(
            dim_side,
            on=fk == F.col("__dim_key"),
            how="left_anti",
        )
    )
    return orphans.select(
        F.lit(run_id).alias("run_id"),
        F.col("partition_id").cast("int").alias("partition_id"),
        F.lit(rule.id).alias("rule_id"),
        F.col(key_column).cast("string").alias("image_id"),
        F.lit(rule.column).alias("column"),
        F.lit(f"exists in {rule.dim_name}.{rule.dim_column}").alias("expected"),
        fk.cast("string").alias("actual"),
        F.lit(KIND_ORPHAN).alias("kind"),
    )
