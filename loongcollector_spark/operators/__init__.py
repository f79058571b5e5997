"""Pipeline operators: parse / filter / enrich / route / aggregate / multiline.

Each module re-expresses one family of the reference's processor/aggregator
plugins as declarative DataFrame transforms (SURVEY.md §2 tables, right
column). All operators are ``DataFrame -> DataFrame`` functions — the pipeline
compiler (pipeline.py) chains them, Catalyst fuses them into whole-stage
codegen, mirroring the reference's in-place processor chains
(CollectionPipeline.cpp:389-421) without any hand-scheduling.
"""

from loongcollector_spark.operators.parse_common import ParserOptions  # noqa: F401
