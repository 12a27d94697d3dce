"""Default parse-stage implementation selector.

Two oracle-parity-tested implementations of P1-P8 exist:

- ``parse.parse_stage`` — pandas UDF (the original, trusted reference
  implementation; oracle-equality and fuzz tested)
- ``parse_arrow.parse_stage_arrow`` — Arrow-native ``mapInArrow`` +
  pyarrow.compute (no Python string objects; measured ~2.2x faster on the
  6.9M-row bench at every parallelism level, and kernel-parity tested
  against the pandas path on edges + hypothesis fuzz)

The batch pipeline defaults to the Arrow path; set
``SPARK_GRAFT_PARSE_IMPL=pandas`` to fall back.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .parse import parse_stage as parse_stage_pandas
from .parse_arrow import parse_stage_arrow


def parse_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    if os.environ.get("SPARK_GRAFT_PARSE_IMPL", "arrow") == "pandas":
        return parse_stage_pandas(df, text_col)
    return parse_stage_arrow(df, text_col)
