"""Input sources: parquet scan helpers and deterministic synthetic generators."""

from loongcollector_spark.sources.synthetic import (  # noqa: F401
    SOURCES,
    expected_tokens,
    generate_sequences,
    render_lines,
)
from loongcollector_spark.sources.tables import load_table, load_tables  # noqa: F401
