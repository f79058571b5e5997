"""Golden JSON-in/JSON-out harness — the reference's unittest pattern.

The C++ tests build a PipelineEventGroup from inline JSON, run one processor,
and compare the serialized output (core/unittest/processor/
ProcessorParseRegexNativeUnittest.cpp:134-151). Here: each tests/golden/*.json
declares {processor, params, input rows, expected rows}; the harness runs the
processor from the PROCESSORS registry and compares the selected columns.

Adding an operator golden test = dropping a JSON file in tests/golden/.
"""

from __future__ import annotations

import json
import pathlib
from collections.abc import Mapping

import pytest

from loongcollector_spark.operators.parse_common import ParserOptions
from loongcollector_spark.pipeline import PROCESSORS

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
CASES = sorted(GOLDEN_DIR.glob("*.json"))


@pytest.mark.parametrize("case_path", CASES, ids=[p.stem for p in CASES])
def test_golden(spark, case_path):
    case = json.loads(case_path.read_text())
    params = dict(case["params"])
    if "options" in params and isinstance(params["options"], Mapping):
        params["options"] = ParserOptions(**params["options"])
    if "cases" in params:  # fields_with_condition switch-cases
        from loongcollector_spark.operators.filters import ConditionCase

        params["cases"] = [ConditionCase(**c) for c in params["cases"]]

    df = spark.createDataFrame(
        [tuple(r) for r in case["input"]["rows"]], case["input"]["schema"]
    )
    out = PROCESSORS[case["processor"]](df, **params)

    cols = case["expected"]["columns"]
    got = [tuple(r) for r in out.select(*cols).collect()]
    want = [tuple(r) for r in case["expected"]["rows"]]
    assert got == want, f"{case_path.stem}: {got} != {want}"
