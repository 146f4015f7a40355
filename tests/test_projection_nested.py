"""Nested / array projection semantics — the F2 `User` fixture
(reference parquet-schema schema.avsc:12-46; Projection semantics O3-O5,
Projection.scala:53-107). In Spark these are native: dotted paths
resolve through structs, SchemaPruning pushes subfield projections into
the parquet scan, and array-element projection is `F.transform`. These
tests pin that the contracts the reference implements by hand hold on
our engine's query surface."""

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes

USER_SCHEMA = (
    "id int, last_name string, first_name string, email string,"
    " accounts array<struct<id:int, type:string, name:string, amount:int>>,"
    " address struct<street1:string, street2:string, city:string,"
    " state:string, zip:string, country:string>"
)


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        (
            i,
            f"last{i}",
            f"first{i}",
            f"u{i}@example.com",
            [(j, "SAVINGS" if j % 2 else "CHECKING", f"acct{i}_{j}", 100 * j)
             for j in range(i % 3)],
            (f"{i} Main St", None, "Springfield", "IL", f"627{i:02d}", "US"),
        )
        for i in range(20)
    ]
    return spark.createDataFrame(rows, USER_SCHEMA)


def test_dotted_path_projection(users):
    """O3: dotted nested paths (Projection.scala:58-72)."""
    out = pes.project(users, "email", "address.zip")
    assert out.columns == ["email", "address_zip"]
    assert out.filter(F.col("address_zip").isNull()).count() == 0


def test_union_null_branch_passthrough(users):
    """O4: nullable struct fields project with nulls preserved
    (Projection.scala:86-100 — unions are only [T, null] nullables)."""
    out = pes.project(users, "address.street2")
    assert out.count() == 20
    assert out.filter(F.col("address_street2").isNull()).count() == 20


def test_array_element_projection(users):
    """O5: projecting the element type of an array (Projection.scala:102-107)
    = F.transform into a narrower struct."""
    out = users.select(
        "id",
        F.transform("accounts", lambda a: F.struct(a["type"], a["amount"])).alias("accounts"),
    )
    f = out.schema["accounts"].dataType.elementType.fieldNames()
    assert f == ["type", "amount"]
    # empty arrays survive (null-vs-empty distinction)
    assert out.filter((F.col("id") % 3 == 0) & (F.size("accounts") == 0)).count() > 0


def test_unknown_nested_field_fails(users):
    """Invalid projection fail-fast (ExampleReadSupport.java:88 contract)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        pes.project(users, "address.nope").collect()


def test_nested_schema_pruning_reaches_scan(spark, users, tmp_path):
    """The reference builds pruned Avro schemas by hand
    (Projection.scala:29-51); Catalyst's SchemaPruning does it for us —
    the scan's ReadSchema must contain only the requested subfield."""
    path = str(tmp_path / "users.parquet")
    users.write.parquet(path)
    df = spark.read.parquet(path).select("address.zip")
    cols = pes.read_schema(df)
    assert cols == ["address"]
    # ReadSchema narrowed to the single subfield, not the whole struct
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "struct<zip:string>" in plan.replace(" ", ""), plan


def test_field_reorder_equivalence(users):
    """F2 ProjectionTestRecord reorderings: selecting fields in a
    different order yields the same multiset of values per field."""
    a = users.select("first_name", "last_name")
    b = users.select("last_name", "first_name").select("first_name", "last_name")
    assert pes.roundtrip_ok(a, b)
