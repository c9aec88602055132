"""SQL face (vptstools_spark/sql.py): tables, UDTFs, and query views are
reachable and composable from spark.sql."""

from vptstools_spark.sql import register_all

SF = "/root/testdata/sf0.001"


def test_tables_and_query_views_compose(spark):
    views = register_all(
        spark, SF, query_names=["pricing_summary", "inv_coverage", "dq_orders"]
    )
    assert set(views) == {"q_pricing_summary", "q_inv_coverage", "q_dq_orders"}
    # a raw table is queryable
    assert spark.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"] > 0
    # a query view runs and composes with a table join in plain SQL
    rows = spark.sql(
        "SELECT l_returnflag, sum_qty FROM q_pricing_summary ORDER BY 1"
    ).collect()
    assert len(rows) > 0
    # view is a lazy plan: predicates written in SQL push into it
    one = spark.sql(
        "SELECT * FROM q_dq_orders WHERE `check` = 'orderkey_unique'"
    ).collect()
    assert len(one) == 1 and bool(one[0]["passed"]) is True


def test_udtfs_registered(spark):
    register_all(spark, SF, query_names=[])
    rows = spark.sql(
        "SELECT c.* FROM VALUES ('hello world') AS t(txt), "
        "LATERAL chunk_text(t.txt, 5, 5) c"
    ).collect()
    assert len(rows) >= 2


def test_register_table_changes_view(spark, tmp_path):
    from vptstools_spark.plans.timetravel import commit_initial, delete_where
    from vptstools_spark.sql import register_table_changes

    path = str(tmp_path / "cdf_sql")
    df = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, 2.0)], "k long, day int, v double"
    )
    commit_initial(df, path, ["day"])
    delete_where(spark, path, "k = 2")
    register_table_changes(spark, path, "cdf_sql_feed", 0)
    got = spark.sql(
        "SELECT _change_type, k FROM cdf_sql_feed"
    ).collect()
    assert [(r["_change_type"], r["k"]) for r in got] == [("delete", 2)]


def test_register_table_pruned_view(spark, tmp_path):
    from vptstools_spark.plans.timetravel import commit_initial
    from vptstools_spark.sql import register_table_pruned

    path = str(tmp_path / "t")
    commit_initial(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, v double"
        ).coalesce(1),
        path,
        stats_cols=["k"],
    )
    register_table_pruned(spark, path, "t_hi", [("k", ">=", 90)])
    assert spark.sql("SELECT count(*) n FROM t_hi").collect()[0]["n"] == 10
    assert spark.sql("SELECT min(k) m FROM t_hi").collect()[0]["m"] == 90
