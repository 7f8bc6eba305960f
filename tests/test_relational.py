"""Relational analytics over the TPC-H-shaped tables: each query checked
against an independent DuckDB evaluation of its oracle SQL (the same
compare the driver runs)."""

import duckdb
import pytest

from orc_ray.pipelines import queries_relational as r

SF = "/root/testdata/sf0.001"


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "region"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _rows(ds):
    return sorted(tuple(sorted(row.items())) for row in ds.take_all())


def _sql_rows(con, sql):
    tbl = con.sql(sql).arrow()
    return sorted(tuple(sorted(row.items())) for row in tbl.to_pylist())


@pytest.mark.parametrize("qname,fn,sql", [
    ("pricing_summary", r.q_pricing_summary, r.SQL_Q_PRICING_SUMMARY),
    ("order_revenue", r.q_order_revenue, r.SQL_Q_ORDER_REVENUE),
    ("region_rollup", r.q_region_rollup, r.SQL_Q_REGION_ROLLUP),
    ("dormant_customers", r.q_dormant_customers,
     r.SQL_Q_DORMANT_CUSTOMERS),
])
def test_relational_query_matches_oracle(ray_session, qname, fn, sql):
    con = _duck(SF)
    assert _rows(fn(SF)) == _sql_rows(con, sql), qname


def test_pricing_summary_covers_all_flag_status_pairs(ray_session):
    rows = r.q_pricing_summary(SF).take_all()
    pairs = {(x["l_returnflag"], x["l_linestatus"]) for x in rows}
    # the synthetic corpus populates the full 3x2 flag/status grid
    assert pairs == {(f, s) for f in "ANR" for s in "FO"}
    assert all(x["count_order"] > 0 for x in rows)


def test_order_revenue_is_top10_descending(ray_session):
    rows = r.q_order_revenue(SF).take_all()
    assert len(rows) == 10
    revs = [x["revenue_x100"] for x in rows]
    assert revs == sorted(revs, reverse=True)
