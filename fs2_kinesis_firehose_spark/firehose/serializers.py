"""Serialization + framing: the reference's ``Serializer[T]`` typeclass and
separator framing, as Column expressions (JVM-side, codegen'd — never a
row-at-a-time Python UDF).

Reference parity:
- ``Serializer[Array[Byte]]`` identity (Serializer.scala:31)  → binary passthrough;
- ``Serializer[String]`` with charset (Serializer.scala:33)   → ``encode(col, charset)``;
- structured rows (new surface)                               → ``to_json(struct(*))``/``to_csv``;
- separator framing ``ser(x) ++ separator`` (firehose.scala:59)
                                                              → ``concat(value, lit(sep))``.

The engine-level registry maps a format name to a ``DataFrame -> Column``
producing a ``BinaryType`` value — the analog of the reference's implicit
typeclass lookup.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

SerializeExpr = Callable[[DataFrame], Column]

_REGISTRY: dict[str, SerializeExpr] = {}


def register_serializer(name: str, fn: SerializeExpr) -> None:
    _REGISTRY[name] = fn


def get_serializer(name: str) -> SerializeExpr:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown serializer {name!r}; registered: {sorted(_REGISTRY)}") from None


def _json_serializer(df: DataFrame) -> Column:
    return F.encode(F.to_json(F.struct(*[F.col(c) for c in df.columns])), "UTF-8")


def _csv_serializer(df: DataFrame) -> Column:
    return F.encode(F.to_csv(F.struct(*[F.col(c) for c in df.columns])), "UTF-8")


def _identity_serializer(df: DataFrame) -> Column:
    """Single binary column passthrough (Serializer.scala:31 analog)."""
    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, BinaryType)]
    if len(cols) != 1:
        raise ValueError(f"'binary' serializer needs exactly one BinaryType column, found {cols}")
    return F.col(cols[0])


def string_serializer(column: str, charset: str = "UTF-8") -> SerializeExpr:
    """Charset-parameterized string serializer (Serializer.scala:33 analog)."""

    def fn(df: DataFrame) -> Column:
        if not isinstance(df.schema[column].dataType, StringType):
            raise ValueError(f"column {column!r} is not StringType")
        return F.encode(F.col(column), charset)

    return fn


register_serializer("json", _json_serializer)
register_serializer("csv", _csv_serializer)
register_serializer("binary", _identity_serializer)


def serialize_and_frame(
    df: DataFrame,
    serializer: str | SerializeExpr = "json",
    separator: bytes = b"\n",
) -> DataFrame:
    """Project a DataFrame to a single framed ``value: binary`` column —
    the ``ser(x) ++ separator`` stage (firehose.scala:57-63) as one
    whole-stage-codegen projection."""
    expr = get_serializer(serializer) if isinstance(serializer, str) else serializer
    value = expr(df)
    if separator:
        value = F.concat(value, F.lit(separator))
    return df.select(value.alias("value"))
