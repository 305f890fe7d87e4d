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


def _links_fast(s: str) -> list:
    # A hash URL can only appear as a complete string token, so a value whose
    # raw JSON lacks the literal substring cannot reference any attachment —
    # skip the full parse+walk (the common case pays ~ns/byte instead of a
    # JSON decode).
    if "hash://sha256/" not in s:
        return []
    return list_hash_urls(tagged_to_value(json.loads(s)))


@F.pandas_udf(ArrayType(StringType()))
def links_udf(v: pd.Series) -> pd.Series:
    """hash:// attachment URIs referenced by a tagged-JSON value column."""
    return v.map(_links_fast)
