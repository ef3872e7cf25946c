"""Type-parser unit tests — ports the 23 reference cases
(/root/reference/src/catalog_provider/glue.rs:580-1104) plus grammar
edge cases.  Pure functions, no Spark session needed."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.errors import TypeMappingError
from datafusion_catalogprovider_glue_spark.types import (
    map_glue_column_to_spark_field,
    map_glue_columns_to_spark_schema,
    parse_glue_data_type,
)

# reference: glue.rs:580-805 — every primitive type
PRIMITIVES = [
    ("tinyint", T.ByteType()),
    ("smallint", T.ShortType()),
    ("int", T.IntegerType()),
    ("integer", T.IntegerType()),
    ("boolean", T.BooleanType()),
    ("bigint", T.LongType()),
    ("float", T.FloatType()),
    ("double", T.DoubleType()),
    ("binary", T.BinaryType()),
    ("timestamp", T.TimestampNTZType()),  # deviation: µs not ns (SURVEY §1.3)
    ("string", T.StringType()),
    ("char", T.StringType()),
    ("varchar", T.StringType()),
    ("date", T.DateType()),
]


@pytest.mark.parametrize("glue_type,expected", PRIMITIVES)
def test_primitive(glue_type, expected):
    assert parse_glue_data_type(glue_type) == expected


def test_decimal():
    # reference: glue.rs:792-805 decimal(12,9)
    assert parse_glue_data_type("decimal(12,9)") == T.DecimalType(12, 9)
    assert parse_glue_data_type("decimal(38,0)") == T.DecimalType(38, 0)


def test_decimal_over_38_raises():
    # deviation: reference maps to Decimal256 (glue.rs:471-473)
    with pytest.raises(TypeMappingError):
        parse_glue_data_type("decimal(76,10)")


# reference: glue.rs:808-869 nested arrays
@pytest.mark.parametrize(
    "glue_type,expected",
    [
        ("array<bigint>", T.ArrayType(T.LongType())),
        ("array<int>", T.ArrayType(T.IntegerType())),
        ("array<string>", T.ArrayType(T.StringType())),
        ("array<array<string>>", T.ArrayType(T.ArrayType(T.StringType()))),
        (
            "array<struct<a:int>>",
            T.ArrayType(T.StructType([T.StructField("a", T.IntegerType())])),
        ),
        ("array<map<string,int>>", T.ArrayType(T.MapType(T.StringType(), T.IntegerType()))),
    ],
)
def test_array(glue_type, expected):
    assert parse_glue_data_type(glue_type) == expected


# reference: glue.rs:872-923 structs incl. struct-of-struct
def test_struct():
    assert parse_glue_data_type("struct<reply_id:int,next_id:int>") == T.StructType(
        [
            T.StructField("reply_id", T.IntegerType()),
            T.StructField("next_id", T.IntegerType()),
        ]
    )


def test_struct_of_struct():
    assert parse_glue_data_type("struct<reply:struct<reply_id:int>,blog_id:bigint>") == (
        T.StructType(
            [
                T.StructField(
                    "reply",
                    T.StructType([T.StructField("reply_id", T.IntegerType())]),
                ),
                T.StructField("blog_id", T.LongType()),
            ]
        )
    )


def test_struct_ident_with_dash_underscore_digits():
    # grammar: ident = [a-zA-Z_\-0-9]+ (glue_datatype.pest:24-27)
    parsed = parse_glue_data_type("struct<a-b_c9:int>")
    assert parsed == T.StructType([T.StructField("a-b_c9", T.IntegerType())])


# reference: glue.rs:926-999 maps incl. map-of-map
@pytest.mark.parametrize(
    "glue_type,expected",
    [
        ("map<string,boolean>", T.MapType(T.StringType(), T.BooleanType())),
        (
            "map<string,map<string,boolean>>",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.BooleanType())),
        ),
        (
            # reference even allows map keys to be complex (glue.rs:985-999)
            "map<map<string,boolean>,array<string>>",
            T.MapType(
                T.MapType(T.StringType(), T.BooleanType()),
                T.ArrayType(T.StringType()),
            ),
        ),
    ],
)
def test_map(glue_type, expected):
    assert parse_glue_data_type(glue_type) == expected


def test_combined_matrix():
    # reference: glue.rs:1001-1104 — one column of every shape
    glue_type = (
        "struct<id:bigint,name:string,tags:array<string>,"
        "attrs:map<string,struct<v:double,ok:boolean>>,"
        "dec:decimal(10,2),when:timestamp>"
    )
    parsed = parse_glue_data_type(glue_type)
    assert isinstance(parsed, T.StructType)
    assert [f.name for f in parsed.fields] == ["id", "name", "tags", "attrs", "dec", "when"]
    assert parsed["attrs"].dataType == T.MapType(
        T.StringType(),
        T.StructType(
            [T.StructField("v", T.DoubleType()), T.StructField("ok", T.BooleanType())]
        ),
    )


@pytest.mark.parametrize(
    "bad",
    [
        "blah",                # unknown type (mod.rs:172-175)
        "",                    # empty
        "array<>",             # missing element
        "array<int",           # unclosed
        "map<string>",         # missing value
        "struct<noType>",      # field without type
        "decimal(10)",         # missing scale (grammar requires both)
        "decimal(10,2",        # unclosed
        "int64",               # trailing garbage (stricter than reference)
    ],
)
def test_errors(bad):
    with pytest.raises(TypeMappingError):
        parse_glue_data_type(bad)


def test_field_and_schema_always_nullable():
    # glue.rs:535 / README.md:53-55: nullability is forced true
    field = map_glue_column_to_spark_field("id", "bigint")
    assert field.nullable is True
    schema = map_glue_columns_to_spark_schema(
        [{"Name": "id", "Type": "bigint"}, {"Name": "tags", "Type": "array<string>"}]
    )
    assert all(f.nullable for f in schema.fields)
    assert schema["tags"].dataType.containsNull is True


def test_char_varchar_with_length_extension():
    """Extension beyond the reference grammar: Hive DDL / real Glue
    catalogs emit char(n)/varchar(n); the reference fails those tables
    at registration (bare keywords only, glue_datatype.pest:17-18).
    We accept and drop the length — same StringType either way."""
    assert parse_glue_data_type("char(10)") == T.StringType()
    assert parse_glue_data_type("varchar(65535)") == T.StringType()
    nested = parse_glue_data_type("struct<a:varchar(5),b:array<char(2)>>")
    assert nested == T.StructType(
        [
            T.StructField("a", T.StringType(), True),
            T.StructField("b", T.ArrayType(T.StringType(), True), True),
        ]
    )
    with pytest.raises(TypeMappingError):
        parse_glue_data_type("char()")
    with pytest.raises(TypeMappingError):
        parse_glue_data_type("varchar(x)")
