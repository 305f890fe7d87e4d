"""Arrow-batched pandas UDFs shared across the engine.

NOTE: no ``from __future__ import annotations`` here — PySpark infers pandas
UDF eval types from *live* type hints, stringified annotations break it.
"""

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .values import hash_json_str, list_hash_urls, tagged_to_value


@F.pandas_udf(StringType())
def hash_value_udf(v: pd.Series) -> pd.Series:
    """object_hash over a tagged-JSON value column (canonical sha256)."""
    return v.map(hash_json_str)


@F.pandas_udf(ArrayType(StringType()))
def links_udf(v: pd.Series) -> pd.Series:
    """hash:// attachment URIs referenced by a tagged-JSON value column."""
    return v.map(lambda s: list_hash_urls(tagged_to_value(json.loads(s))))
