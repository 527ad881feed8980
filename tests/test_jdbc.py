"""JDBC ingest adapter vs an in-process Derby database: column mapping
+ NULL backfill parity with the parquet path, partitioned reads, and
identifier validation. Derby ships in Spark's jars (it backs the Hive
metastore), so this exercises a real JDBC round-trip with no extra
dependency — and its UPPERCASE identifier folding doubles as the
case-insensitivity probe."""

from __future__ import annotations

import datetime as dt

import pytest

from name_matcher_spark.operators.extract import apply_column_mapping
from name_matcher_spark.sources.jdbc import read_persons_jdbc

URL = "jdbc:derby:memory:nmsjdbc;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

ROWS = [
    (i, f"First{i}", None if i % 7 == 3 else f"Last{i}", dt.date(1980 + i % 20, 1 + i % 12, 5))
    for i in range(50)
]


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE people (pid INT, fname VARCHAR(40), lname VARCHAR(40), bdate DATE)"
    )
    ps = conn.prepareStatement("INSERT INTO people VALUES (?,?,?,?)")
    types = jvm.java.sql.Types
    for pid, fn, ln, bd in ROWS:
        ps.setInt(1, pid)
        ps.setString(2, fn)
        if ln is None:
            ps.setNull(3, types.VARCHAR)
        else:
            ps.setString(3, ln)
        ps.setDate(4, jvm.java.sql.Date.valueOf(bd.isoformat()))
        ps.executeUpdate()
    st.executeUpdate("CREATE TABLE empty_people (pid INT, fname VARCHAR(5), lname VARCHAR(5), bdate DATE)")
    st.close()
    conn.close()
    yield URL


MAPPING = {"id": "pid", "first_name": "fname", "last_name": "lname", "birthdate": "bdate"}


def test_jdbc_mapping_and_null_backfill(spark, derby):
    df = read_persons_jdbc(
        spark, URL, "people", mapping=MAPPING, num_partitions=4, driver=DRIVER
    )
    assert df.columns == [
        "id", "first_name", "last_name", "birthdate", "uuid", "middle_name", "hh_id",
    ]
    got = {r.id: r for r in df.collect()}
    assert len(got) == 50
    # optional columns NULL-backfill (schema.rs NULL AS uuid retry)
    assert got[0].uuid is None and got[0].middle_name is None and got[0].hh_id is None
    # real NULLs survive the trip
    assert got[3].last_name is None and got[11].last_name == "Last11"
    assert got[7].birthdate == dt.date(1987, 8, 5)


def test_jdbc_partitioned_read_covers_all_rows(spark, derby):
    # auto-probed MIN/MAX bounds, 4 stride partitions, no row lost/duped
    df = read_persons_jdbc(
        spark, URL, "people", mapping=MAPPING, num_partitions=4, driver=DRIVER
    )
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in df.collect()) == list(range(50))


def test_jdbc_parity_with_parquet_path(spark, derby, tmp_path):
    # the same physical rows through the lake path must yield the same
    # logical table (modulo int width: Derby INT -> int, parquet long)
    pq_dir = str(tmp_path / "people.parquet")
    spark.createDataFrame(
        ROWS, "pid int, fname string, lname string, bdate date"
    ).write.parquet(pq_dir)
    via_lake = apply_column_mapping(spark.read.parquet(pq_dir), MAPPING)
    via_jdbc = read_persons_jdbc(
        spark, URL, "people", mapping=MAPPING, num_partitions=2, driver=DRIVER
    )
    key = lambda r: r.id  # noqa: E731
    assert sorted(via_jdbc.collect(), key=key) == sorted(via_lake.collect(), key=key)


def test_jdbc_empty_table_and_bad_identifiers(spark, derby):
    df = read_persons_jdbc(
        spark, URL, "empty_people", mapping=MAPPING, num_partitions=4, driver=DRIVER
    )
    assert df.count() == 0 and "uuid" in df.columns
    with pytest.raises(ValueError, match="table identifier"):
        read_persons_jdbc(spark, URL, "people; DROP TABLE x", mapping=MAPPING)
    with pytest.raises(ValueError, match="partition column"):
        read_persons_jdbc(
            spark, URL, "people", mapping=MAPPING, partition_column="pid)--"
        )


def test_jdbc_required_column_missing_raises(spark, derby):
    with pytest.raises(Exception, match="required column"):
        read_persons_jdbc(
            spark,
            URL,
            "people",
            mapping={"id": "pid", "first_name": "nope"},
            num_partitions=1,
            driver=DRIVER,
        ).collect()


def test_jdbc_one_sided_bound_honored(spark, derby):
    """An explicit bound on ONE side must survive the MIN/MAX probe for
    the other side. upper_bound=9 pins the stride window to [min, 9]:
    ids 9..49 all land in the last stride partition. The old behavior
    (probe overwrites both sides) would spread rows ~evenly."""
    df = read_persons_jdbc(
        spark, URL, "people", mapping=MAPPING,
        num_partitions=4, upper_bound=9, driver=DRIVER,
    )
    # correctness is unconditional: stride bounds never drop rows
    assert sorted(r.id for r in df.collect()) == list(range(50))
    sizes = df.rdd.glom().map(len).collect()
    assert len(sizes) == 4 and max(sizes) >= 40


def test_explicit_optional_mapping_typo_raises(spark):
    """An EXPLICIT optional-column mapping that fails to resolve is a
    typo and must raise — silently NULL-backfilling it would degrade
    recall with a 'successful' run."""
    df = spark.createDataFrame(
        [(1, "A", "B", dt.date(1990, 1, 1), "u1")],
        "id long, first_name string, last_name string, birthdate date, my_uuid string",
    )
    with pytest.raises(ValueError, match="my_uudi"):
        apply_column_mapping(df, {"uuid": "my_uudi"})
    # unmapped optional columns still backfill
    out = apply_column_mapping(df, {"uuid": "my_uuid"})
    row = out.first()
    assert row.uuid == "u1" and row.middle_name is None
