"""Source-layer tests: feed readiness, schema-on-read tolerance, warehouse IO."""

from __future__ import annotations

from decimal import Decimal

from batch_data_pipeline_exercise_spark.schemas import PRODUCTS_FEED
from batch_data_pipeline_exercise_spark.sources.csv_feed import feed_exists, read_csv_feed


def test_feed_exists(spark, tmp_path):
    assert not feed_exists(spark, str(tmp_path / "products_2021-03-01.csv"))
    (tmp_path / "products_2021-03-01.csv").write_text("id,title,category,price\n")
    assert feed_exists(spark, str(tmp_path / "products_2021-03-01.csv"))
    # glob pattern, like the reference's sensed path convention
    assert feed_exists(spark, str(tmp_path / "products_*.csv"))


def test_csv_permissive_bad_rows(spark, tmp_path):
    """The reference's Postgres staging tolerates bad values as NULLs at
    load; PERMISSIVE schema-on-read matches: malformed fields null out,
    rows are kept, and the batch stamp is applied everywhere."""
    p = tmp_path / "products_2021-03-01.csv"
    p.write_text(
        "id,title,category,price\n"
        "p1,Good Row,tools,9.99\n"
        'p2,"Quoted, With Comma",gadgets,NOT_A_NUMBER\n'
        "p3,Bare,misc,\n"
    )
    df = read_csv_feed(spark, str(p), PRODUCTS_FEED, ts="2021-03-01 01:00:00")
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["p1"]["price"] == Decimal("9.99")
    assert rows["p2"]["title"] == "Quoted, With Comma" and rows["p2"]["price"] is None
    assert rows["p3"]["price"] is None
    assert all(str(r["processed_time"]).startswith("2021-03-01") for r in rows.values())
