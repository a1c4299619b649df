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
    """Rows of df whose foreign key (single column or composite tuple) has
    no match in the dimension's key column(s).

    NULL foreign keys are skipped (NotNullRule's job) — for a composite key,
    ANY NULL component skips the row (SQL FK semantics) — matching left-anti
    NULL behavior explicitly rather than by accident.
    """
    fact_keys = rule.fact_keys()
    dim_key_names = rule.dim_keys()
    if rule.when:
        df = df.where(F.expr(rule.when))  # scope-gated integrity
    dim_keys = dim.select(
        *[
            F.col(d).alias(f"__dim_key{i}")
            for i, d in enumerate(dim_key_names)
        ]
    ).dropDuplicates()
    # broadcast_dim=False (huge dims — a 10^9-key registry cannot be
    # broadcast) leaves the join unhinted: AQE picks sort-merge/shuffled-hash
    # from the runtime sizes, with skew-join splitting on hot keys, or still
    # broadcasts if the deduped key set turns out small
    dim_side = F.broadcast(dim_keys) if rule.broadcast_dim else dim_keys
    not_null = F.lit(True)
    cond = F.lit(True)
    for i, c in enumerate(fact_keys):
        not_null = not_null & F.col(c).isNotNull()
        cond = cond & (F.col(c) == F.col(f"__dim_key{i}"))
    orphans = df.where(not_null).join(dim_side, on=cond, how="left_anti")
    if len(fact_keys) == 1:
        col_label = rule.column
        expected = f"exists in {rule.dim_name}.{rule.dim_column}"
        actual = F.col(fact_keys[0]).cast("string")
    else:
        col_label = ",".join(fact_keys)
        expected = f"exists in {rule.dim_name}.({','.join(dim_key_names)})"
        actual = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in fact_keys]
        )
    return orphans.select(
        F.lit(run_id).alias("run_id"),
        F.col("partition_id").cast("int").alias("partition_id"),
        F.lit(rule.id).alias("rule_id"),
        F.col(key_column).cast("string").alias("image_id"),
        F.lit(col_label).alias("column"),
        F.lit(expected).alias("expected"),
        actual.alias("actual"),
        F.lit(KIND_ORPHAN).alias("kind"),
    )
