"""mdvalidate_spark — a PySpark-native constraint-validation engine.

Re-expresses the conceptual core of 404Wolf/mdvalidate (a tree-walking
Markdown validator over a declarative schema AST; see SURVEY.md) as a compiled
constraint DAG evaluated over huge tables with DataFrame ops and vectorized
Arrow UDFs: declarative spec → compile (lint + stage grouping) → per-partition
incremental evaluation with a resumable manifest checkpoint → global finalize
pass → typed violation rows + metrics.

Quick start::

    from mdvalidate_spark import Spec, RegexRule, RangeRule, validate_table

    spec = Spec(rules=(
        RegexRule("caption_ok", column="caption", pattern=r"A photo .*"),
        RangeRule("w_ok", column="w", min=1, max=10000),
    ), key_column="image_id")
    report = validate_table(spark, images_df, spec)
    report.violations.show()
"""

from .compile import ConstraintProgram, compile_spec
from .errors import MdvSparkError, SchemaError
from .run import Report, ValidationRun, smoke_validate, validate_table
from .session import get_spark
from .spec import (
    AssociationRule,
    BenfordRule,
    CaptureRule,
    ConcentrationRule,
    EmbeddingHealthRule,
    GapRule,
    ColumnStatsRule,
    CompositeRegexRule,
    CountRule,
    DomainRule,
    DriftRule,
    ExprRule,
    FormatRule,
    FreshnessRule,
    MetricBoundRule,
    FunctionalDependencyRule,
    LiteralRule,
    MonotonicRule,
    NotNullRule,
    OutlierRule,
    OverlapRule,
    PiiRule,
    DegenerateImageRule,
    PixelRule,
    RangeRule,
    RefIntegrityRule,
    RegexRule,
    RepetitionRule,
    Rule,
    SchemaRule,
    SequenceRule,
    Spec,
    TextQualityRule,
    UniqueRule,
    HeaderRule,
    AlignmentRule,
    VectorRule,
    VolumeRule,
)

__all__ = [
    "AssociationRule",
    "BenfordRule",
    "CaptureRule",
    "ConcentrationRule",
    "GapRule",
    "ColumnStatsRule",
    "CompositeRegexRule",
    "ConstraintProgram",
    "CountRule",
    "EmbeddingHealthRule",
    "DomainRule",
    "DriftRule",
    "ExprRule",
    "FormatRule",
    "FreshnessRule",
    "MetricBoundRule",
    "FunctionalDependencyRule",
    "LiteralRule",
    "MdvSparkError",
    "MonotonicRule",
    "NotNullRule",
    "OutlierRule",
    "OverlapRule",
    "PiiRule",
    "DegenerateImageRule",
    "PixelRule",
    "RangeRule",
    "RefIntegrityRule",
    "RegexRule",
    "RepetitionRule",
    "Report",
    "Rule",
    "SchemaError",
    "SchemaRule",
    "SequenceRule",
    "Spec",
    "TextQualityRule",
    "UniqueRule",
    "ValidationRun",
    "HeaderRule",
    "AlignmentRule",
    "VectorRule",
    "VolumeRule",
    "compile_spec",
    "get_spark",
    "smoke_validate",
    "validate_table",
]

__version__ = "0.1.0"
