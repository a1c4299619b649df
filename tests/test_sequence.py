"""SequenceRule — ordered disjoint consumption by chained matchers (the
ListVsList re-expression, reference lists.rs:92-511)."""

import pytest

from mdvalidate_spark.compile import compile_spec
from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators.sequence import sequence_violations
from mdvalidate_spark.spec import SequenceRule, SequenceStep, Spec

COLS = ["k", "grp", "pos", "val"]


def _rule(steps):
    return SequenceRule(
        "seq", column="val", group_by=("grp",), order_column="pos", steps=steps
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, grp string, pos int, val string")


def test_chained_steps_consume_disjoint_ordered_ranges(spark):
    """Two fixed header steps then a variable tail: each run checked against
    its own pattern, out-of-order input restored by the order column."""
    rows = [
        # group A: H, T, b1, b2 — valid
        ("a1", "A", 1, "H"), ("a3", "A", 3, "b1"), ("a2", "A", 2, "T"), ("a4", "A", 4, "b2"),
        # group B: header wrong at pos 2, body wrong at pos 4
        ("b1", "B", 1, "H"), ("b2", "B", 2, "X"), ("b3", "B", 3, "b9"), ("b4", "B", 4, "nope"),
    ]
    rule = _rule((
        SequenceStep(pattern="H", min=1, max=1),
        SequenceStep(pattern="T", min=1, max=1),
        SequenceStep(pattern="b\\d", min=1, max=5),
    ))
    v = sequence_violations(_df(spark, rows), rule, "r", "k").collect()
    got = {(r["image_id"], r["kind"]) for r in v}
    assert got == {("b2", "matcher"), ("b4", "matcher")}
    exp = {r["image_id"]: r["expected"] for r in v}
    assert exp["b2"] == "^(?:T)$"   # rank-2 row judged by step 2's pattern
    assert exp["b4"] == "^(?:b\\d)$"  # tail row judged by the last pattern


def test_group_length_bounds(spark):
    """Groups shorter than the fixed prefix + min tail, or longer than the
    max, get ONE count violation (WrongListCount / ChildrenLengthMismatch)."""
    rows = (
        [("s1", "SHORT", 1, "H")]                                  # 1 < 2+1
        + [(f"g{i}", "GOOD", i, "H" if i == 1 else ("T" if i == 2 else "b1"))
           for i in range(1, 5)]                                   # 4 in [3, 4]
        + [(f"l{i}", "LONG", i, "H" if i == 1 else ("T" if i == 2 else "b1"))
           for i in range(1, 6)]                                   # 5 > 4
    )
    rule = _rule((
        SequenceStep(pattern="H", min=1, max=1),
        SequenceStep(pattern="T", min=1, max=1),
        SequenceStep(pattern="b1", min=1, max=2),
    ))
    v = sequence_violations(_df(spark, rows), rule, "r", "k")
    counts = {r["image_id"]: r["actual"] for r in v.where("kind = 'count'").collect()}
    assert counts == {"SHORT": "1", "LONG": "5"}
    # SHORT's lone row matches step 1 — no matcher violation for it
    assert v.where("kind = 'matcher'").count() == 0


def test_open_ended_tail(spark):
    rows = [(f"r{i}", "G", i, "x") for i in range(1, 12)]
    rule = _rule((SequenceStep(pattern="x", min=1, max=None),))
    assert sequence_violations(_df(spark, rows), rule, "r", "k").count() == 0


def test_variable_step_must_be_last(spark):
    rule = _rule((
        SequenceStep(pattern="a", min=1, max=3),
        SequenceStep(pattern="b", min=1, max=1),
    ))
    with pytest.raises(SchemaError, match="variable-length"):
        compile_spec(Spec(rules=(rule,), key_column="k"), COLS)


def test_sequence_json_roundtrip():
    from mdvalidate_spark.spec_io import rule_from_dict, rule_to_dict

    rule = _rule((
        SequenceStep(pattern="H", min=1, max=1),
        SequenceStep(pattern="b\\d", min=0, max=None),
    ))
    rt = rule_from_dict(rule_to_dict(rule))
    assert rt == rule


def test_sequence_through_validation_run(spark):
    """Rides finalize (groups span engine partitions)."""
    from mdvalidate_spark.run import ValidationRun

    rows = [
        ("a1", "A", 1, "H"), ("a2", "A", 2, "b1"),
        ("b1", "B", 1, "WRONG"), ("b2", "B", 2, "b2"),
    ]
    spec = Spec(
        rules=(_rule((
            SequenceStep(pattern="H", min=1, max=1),
            SequenceStep(pattern="b\\d", min=1, max=3),
        )),),
        key_column="k",
        n_partitions=2,
    )
    report = ValidationRun(spark, spec, _df(spark, rows), run_id="sq").validate()
    v = report.violations.where("rule_id = 'seq'").collect()
    assert {(r["image_id"], r["kind"]) for r in v} == {("b1", "matcher")}
