"""Glue GetPartitions Expression evaluator (A13d) — grammar unit tests.

Pure Python (no SparkSession): the parser/evaluator in
catalog/fake_glue.py mirrors the live API's documented filter subset.
"""

import pytest

from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
    AwsError,
    FakeGlueClient,
    dict_from_values,
    parquet_table,
    parse_partition_expression,
)

KEYS = [("seg", "string"), ("year", "int")]


def row(seg, year):
    return dict_from_values(KEYS, [seg, year])


@pytest.mark.parametrize(
    "expr,match,nomatch",
    [
        ("seg = 'A'", ("A", "2020"), ("B", "2020")),
        ("seg <> 'A'", ("B", "2020"), ("A", "2020")),
        ("year > 2020", ("A", "2021"), ("A", "2020")),
        ("year >= 2020", ("A", "2020"), ("A", "2019")),
        ("year < 2020", ("A", "2019"), ("A", "2020")),
        ("year <= 2020", ("A", "2020"), ("A", "2021")),
        # numeric, NOT lexicographic: '9' < '10' for an int key
        ("year < 10", ("A", "9"), ("A", "10")),
        ("seg LIKE 'AU%'", ("AUTO", "2020"), ("BAU", "2020")),
        ("seg LIKE '_U%'", ("AUTO", "2020"), ("UA", "2020")),
        ("seg NOT LIKE 'AU%'", ("B", "2020"), ("AUTO", "2020")),
        ("seg IN ('A', 'B')", ("B", "2020"), ("C", "2020")),
        ("seg NOT IN ('A', 'B')", ("C", "2020"), ("A", "2020")),
        ("year BETWEEN 2019 AND 2021", ("A", "2020"), ("A", "2022")),
        ("year NOT BETWEEN 2019 AND 2021", ("A", "2022"), ("A", "2020")),
        ("seg = 'A' AND year = 2020", ("A", "2020"), ("A", "2021")),
        ("seg = 'A' OR year = 2020", ("B", "2020"), ("B", "2021")),
        # AND binds tighter than OR
        ("seg = 'A' OR seg = 'B' AND year = 2020", ("A", "2021"), ("B", "2021")),
        ("(seg = 'A' OR seg = 'B') AND year = 2020", ("B", "2020"), ("A", "2021")),
        ("NOT seg = 'A'", ("B", "2020"), ("A", "2020")),
        # escaped quote in a string literal
        ("seg = 'it''s'", ("it's", "2020"), ("its", "2020")),
    ],
)
def test_expression_semantics(expr, match, nomatch):
    pred = parse_partition_expression(expr)
    assert pred(row(*match)), (expr, match)
    assert not pred(row(*nomatch)), (expr, nomatch)


def test_null_semantics():
    """Comparisons against NULL are three-valued-false; IS NULL / IS
    NOT NULL see the Hive default-partition sentinel."""
    null_row = dict_from_values(KEYS, ["__HIVE_DEFAULT_PARTITION__", "2020"])
    assert not parse_partition_expression("seg = 'A'")(null_row)
    assert not parse_partition_expression("seg <> 'A'")(null_row)
    assert not parse_partition_expression("seg LIKE '%'")(null_row)
    assert parse_partition_expression("seg IS NULL")(null_row)
    assert not parse_partition_expression("seg IS NOT NULL")(null_row)
    assert parse_partition_expression("seg IS NOT NULL")(row("A", "1"))


@pytest.mark.parametrize(
    "bad",
    ["seg =", "= 'A'", "seg ~ 'A'", "seg IN 'A'", "seg = 'A' extra",
     "seg = 'unterminated"],
)
def test_invalid_expressions_raise(bad):
    with pytest.raises(ValueError):
        parse_partition_expression(bad)


def _client(page_size=0):
    parts = [
        {"Values": [seg, str(y)],
         "StorageDescriptor": {"Location": f"/tmp/{seg}/{y}"}}
        for seg in ("A", "B", "C") for y in (2019, 2020)
    ]
    return FakeGlueClient(
        {"db": {"t": parquet_table(
            "db", "t", "/tmp/t", [("x", "int")],
            partition_keys=KEYS,
        )}},
        page_size=page_size,
        partitions={("db", "t"): parts},
    )


def test_get_partitions_filters_server_side_before_paging():
    """The expression shrinks the PAGE COUNT, not just the result —
    the service filters first, then paginates."""
    c = _client(page_size=2)
    got, token, pages = [], None, 0
    while True:
        kw = {"NextToken": token} if token else {}
        r = c.get_partitions(
            DatabaseName="db", TableName="t",
            Expression="seg = 'B' AND year = 2020", **kw,
        )
        got.extend(r["Partitions"])
        pages += 1
        token = r.get("NextToken")
        if not token:
            break
    assert [p["Values"] for p in got] == [["B", "2020"]]
    assert pages == 1  # 6 partitions unfiltered would be 3 pages


def test_expression_parity_with_moto_glue():
    """The same expressions against moto's independent implementation
    of the live API return the same partition subsets as FakeGlue —
    an external pin on the grammar semantics."""
    moto = pytest.importorskip("moto")
    from moto import mock_aws

    parts = [(seg, str(y)) for seg in ("A", "B", "C") for y in (2019, 2020)]
    exprs = [
        "seg = 'B'",
        "seg <> 'B' AND year = 2020",
        "year BETWEEN 2019 AND 2019",
        "seg IN ('A', 'C') AND year > 2019",
        "seg LIKE 'A%' OR year < 2020",
    ]
    fake = _client()
    fake_out = {
        e: sorted(
            tuple(p["Values"]) for p in fake.get_partitions(
                DatabaseName="db", TableName="t", Expression=e
            )["Partitions"]
        )
        for e in exprs
    }
    with mock_aws():
        import boto3

        g = boto3.client("glue", region_name="us-east-1")
        g.create_database(DatabaseInput={"Name": "db"})
        g.create_table(DatabaseName="db", TableInput={
            "Name": "t",
            "PartitionKeys": [{"Name": "seg", "Type": "string"},
                              {"Name": "year", "Type": "int"}],
            "StorageDescriptor": {
                "Columns": [{"Name": "x", "Type": "int"}],
                "Location": "/tmp/t",
            },
        })
        for seg, y in parts:
            g.create_partition(
                DatabaseName="db", TableName="t",
                PartitionInput={
                    "Values": [seg, y],
                    "StorageDescriptor": {"Location": f"/tmp/t/{seg}/{y}"},
                },
            )
        for e in exprs:
            got = sorted(
                tuple(p["Values"]) for p in g.get_partitions(
                    DatabaseName="db", TableName="t", Expression=e
                )["Partitions"]
            )
            assert got == fake_out[e], e
    assert moto is not None


def test_table_versions_track_updates_and_match_moto():
    """UpdateTable grows the version history; GetTableVersions /
    GetTableVersion serve the full historical Table dicts — parity
    checked against moto's implementation of the live API."""
    from moto import mock_aws

    fake = FakeGlueClient(
        {"db": {"t": parquet_table("db", "t", "/tmp/a", [("x", "int")])}}
    )
    fake.update_table(
        DatabaseName="db",
        TableInput=parquet_table(
            "db", "t", "/tmp/b", [("x", "int"), ("y", "string")]
        ),
    )
    vs = fake.get_table_versions(DatabaseName="db", TableName="t")
    fake_hist = [
        (v["VersionId"], v["Table"]["StorageDescriptor"]["Location"])
        for v in vs["TableVersions"]
    ]
    assert fake_hist == [("1", "/tmp/a"), ("2", "/tmp/b")]
    one = fake.get_table_version(
        DatabaseName="db", TableName="t", VersionId="1"
    )
    assert one["TableVersion"]["Table"]["StorageDescriptor"][
        "Location"
    ] == "/tmp/a"
    assert len(
        one["TableVersion"]["Table"]["StorageDescriptor"]["Columns"]
    ) == 1
    with pytest.raises(AwsError, match="EntityNotFound"):
        fake.get_table_version(
            DatabaseName="db", TableName="t", VersionId="9"
        )
    with mock_aws():
        import boto3

        g = boto3.client("glue", region_name="us-east-1")
        g.create_database(DatabaseInput={"Name": "db"})
        g.create_table(DatabaseName="db", TableInput={
            "Name": "t",
            "StorageDescriptor": {
                "Columns": [{"Name": "x", "Type": "int"}],
                "Location": "/tmp/a",
            },
        })
        g.update_table(DatabaseName="db", TableInput={
            "Name": "t",
            "StorageDescriptor": {
                "Columns": [{"Name": "x", "Type": "int"},
                            {"Name": "y", "Type": "string"}],
                "Location": "/tmp/b",
            },
        })
        moto_hist = [
            (v["VersionId"], v["Table"]["StorageDescriptor"]["Location"])
            for v in g.get_table_versions(
                DatabaseName="db", TableName="t"
            )["TableVersions"]
        ]
        assert moto_hist == fake_hist
        moto_one = g.get_table_version(
            DatabaseName="db", TableName="t", VersionId="1"
        )
        assert moto_one["TableVersion"]["Table"]["StorageDescriptor"][
            "Location"
        ] == "/tmp/a"


def test_get_partitions_bad_expression_is_invalid_input():
    c = _client()
    with pytest.raises(AwsError, match="InvalidInputException"):
        c.get_partitions(DatabaseName="db", TableName="t", Expression="seg ~~ 1")
    with pytest.raises(AwsError, match="InvalidInputException"):
        c.get_partitions(
            DatabaseName="db", TableName="t", Expression="x" * 3000
        )
