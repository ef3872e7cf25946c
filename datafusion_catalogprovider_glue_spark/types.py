"""Glue type-string → PySpark DataType.

Behavioral parity with the reference's parser + mapper
(``/root/reference/src/glue_data_type_parser/mod.rs:38-177``, grammar
``glue_datatype.pest:3-27``, Arrow mapping ``glue.rs:456-521``), built
as an independent recursive-descent parser over the same grammar:

    DataType   = SimpleType | "array<" DataType ">"
               | "map<" DataType "," DataType ">"
               | "struct<" ident ":" DataType ("," ident ":" DataType)* ">"
    SimpleType = tinyint|smallint|int|integer|boolean|bigint|float|double
               | binary|date|timestamp|string|char|varchar
               | "decimal(" number "," number ")"
    ident      = [a-zA-Z_\\-0-9]+

Documented deviations from the reference (SURVEY.md §1.3):

* ``timestamp`` → ``TimestampNTZType`` (µs) — reference maps to
  tz-naive Timestamp(Nanosecond) (glue.rs:466); Spark timestamps are
  microsecond, so ns truncates to µs.
* ``decimal(p,s)`` → ``DecimalType(p,s)`` with p ≤ 38 enforced —
  reference picks Decimal256 (glue.rs:471-473); Spark (and Glue/Hive
  itself) cap precision at 38, so >38 raises ``TypeMappingError``.
* ``char``/``varchar`` → ``StringType`` (length dropped), same as the
  reference's Utf8 mapping (glue.rs:468-469).
* every field/element is nullable — Glue carries no nullability
  (glue.rs:535, README.md:53-55).
"""

from __future__ import annotations

from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.errors import TypeMappingError

_SIMPLE: dict[str, T.DataType] = {
    # longest-match order is handled by the tokenizer, not dict order
    "tinyint": T.ByteType(),        # glue.rs:458 Int8
    "smallint": T.ShortType(),      # glue.rs:459 Int16
    "integer": T.IntegerType(),     # glue.rs:460 Int32
    "int": T.IntegerType(),         # glue.rs:460 Int32
    "boolean": T.BooleanType(),     # glue.rs:461 Boolean
    "bigint": T.LongType(),         # glue.rs:462 Int64
    "float": T.FloatType(),         # glue.rs:463 Float32
    "double": T.DoubleType(),       # glue.rs:464 Float64
    "binary": T.BinaryType(),       # glue.rs:465 Binary
    "timestamp": T.TimestampNTZType(),  # glue.rs:466 Timestamp(ns, None) → µs
    "string": T.StringType(),       # glue.rs:467 Utf8
    "char": T.StringType(),         # glue.rs:468 Utf8 (length dropped)
    "varchar": T.StringType(),      # glue.rs:469 Utf8 (length dropped)
    "date": T.DateType(),           # glue.rs:470 Date32
}

_IDENT_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-"
)

MAX_DECIMAL_PRECISION = 38


class _Parser:
    """Single-pass recursive descent over the type string."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def fail(self, what: str) -> TypeMappingError:
        return TypeMappingError(
            f"Error while parsing {self.text!r}: expected {what} at offset {self.pos}"
        )

    def eat(self, literal: str) -> bool:
        if self.text.startswith(literal, self.pos):
            self.pos += len(literal)
            return True
        return False

    def expect(self, literal: str) -> None:
        if not self.eat(literal):
            raise self.fail(repr(literal))

    def ident(self) -> str:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] in _IDENT_CHARS:
            self.pos += 1
        if self.pos == start:
            raise self.fail("identifier")
        return self.text[start:self.pos]

    def number(self) -> int:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos].isdigit():
            self.pos += 1
        if self.pos == start:
            raise self.fail("number")
        return int(self.text[start:self.pos])

    def data_type(self) -> T.DataType:
        if self.eat("array<"):
            element = self.data_type()
            self.expect(">")
            # glue.rs:474-482: List with nullable items
            return T.ArrayType(element, containsNull=True)
        if self.eat("map<"):
            key = self.data_type()
            self.expect(",")
            value = self.data_type()
            self.expect(">")
            # glue.rs:483-499: value nullable.  (The reference marks even
            # keys nullable, glue.rs:492; Spark map keys are non-null —
            # benign divergence, SURVEY §1.3.)
            return T.MapType(key, value, valueContainsNull=True)
        if self.eat("struct<"):
            fields = [self.struct_field()]
            while self.eat(","):
                fields.append(self.struct_field())
            self.expect(">")
            # glue.rs:500-508: all struct fields nullable
            return T.StructType(fields)
        if self.eat("decimal("):
            precision = self.number()
            self.expect(",")
            scale = self.number()
            self.expect(")")
            if precision > MAX_DECIMAL_PRECISION:
                # deviation: reference goes Decimal256 (glue.rs:471-473);
                # Spark caps at 38 — as does Glue/Hive itself.
                raise TypeMappingError(
                    f"decimal precision {precision} exceeds Spark's max "
                    f"{MAX_DECIMAL_PRECISION} (reference maps to Decimal256)"
                )
            return T.DecimalType(precision, scale)
        # simple types: longest keyword first so 'integer' beats 'int'
        for keyword in sorted(_SIMPLE, key=len, reverse=True):
            if self.eat(keyword):
                if keyword in ("char", "varchar") and self.eat("("):
                    # extension beyond the reference grammar: Hive DDL
                    # allows char(n)/varchar(n) and real Glue/Athena
                    # catalogs emit them, but the reference's pest
                    # grammar accepts only the bare keywords
                    # (glue_datatype.pest:17-18) and fails such tables
                    # at registration (collected per-table,
                    # glue.rs:124-132).  The length is dropped either
                    # way (→ Utf8/StringType, glue.rs:468-469), so
                    # accepting it only widens coverage, never changes
                    # a value.  Documented in SURVEY §1.3.
                    self.number()
                    self.expect(")")
                return _SIMPLE[keyword]
        raise self.fail("a Glue data type")

    def struct_field(self) -> T.StructField:
        name = self.ident()
        self.expect(":")
        dtype = self.data_type()
        return T.StructField(name, dtype, nullable=True)  # glue.rs:535


def parse_glue_data_type(glue_type: str) -> T.DataType:
    """Parse a Glue/Hive type string into a PySpark DataType.

    Raises ``TypeMappingError`` on anything outside the grammar,
    including trailing garbage (slightly stricter than the reference,
    whose un-anchored pest parse ignores trailing input after a valid
    prefix; unknown types error the same way, mod.rs:40-43, 172-175).
    """
    parser = _Parser(glue_type.strip())
    dtype = parser.data_type()
    if parser.pos != len(parser.text):
        raise parser.fail("end of input")
    return dtype


def map_glue_column_to_spark_field(name: str, glue_type: str) -> T.StructField:
    """Glue Column{Name,Type} → StructField, always nullable
    (glue.rs:523-536)."""
    return T.StructField(name, parse_glue_data_type(glue_type), nullable=True)


def map_glue_columns_to_spark_schema(columns: list[dict]) -> T.StructType:
    """Glue ``StorageDescriptor.Columns`` → StructType
    (glue.rs:538-545).  ``columns`` is AWS-shaped: [{"Name":…, "Type":…}]."""
    return T.StructType(
        [map_glue_column_to_spark_field(c["Name"], c["Type"]) for c in columns]
    )
