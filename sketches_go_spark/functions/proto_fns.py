"""Spark column converters between the native compact blob format
(core.encoding) and the protobuf wire format (core.protobuf) — lets a
sketches DataFrame exchange columns with Go/Java DataDog-ecosystem consumers
(reference surface: ddsketch.go:313-364 ToProto/FromProto).

Both directions are vectorized pandas UDFs over the (tiny) blob columns; the
heavy lifting stays in the relational/UDAF build paths."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from sketches_go_spark.core.ddsketch import DDSketchConfig
from sketches_go_spark.core.encoding import decode_sketch, encode_sketch
from sketches_go_spark.core.protobuf import decode_proto, encode_proto


def to_proto(sketch: Column) -> Column:
    """Native encoded-sketch column -> pb.DDSketch bytes column.
    NOTE: protobuf carries no exact-stats blocks; they are dropped."""

    @F.pandas_udf(BinaryType())
    def conv(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_proto(decode_sketch(bytes(b))) if b is not None else None
                for b in blobs
            ]
        )

    return conv(sketch)


def from_proto(proto: Column, config: DDSketchConfig | None = None) -> Column:
    """pb.DDSketch bytes column -> native encoded-sketch column."""

    @F.pandas_udf(BinaryType())
    def conv(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_sketch(decode_proto(bytes(b), config=config))
                if b is not None
                else None
                for b in blobs
            ]
        )

    return conv(proto)
