"""Z-order layout (operators/layout.py): curve exactness vs a
plain-Python twin AND a physical check — zorder_write's actual parquet
footers must carry tight per-file min/max rectangles on BOTH
dimensions, which is the entire point of the layout."""

from __future__ import annotations

import duckdb
import pytest

from llm_knowledge_graph_spark.operators.layout import (cluster_files,
                                                        morton_py,
                                                        with_zvalue,
                                                        z_expr_sql,
                                                        zorder_write)

BITS = 8
XMIN, XMAX = 3, 130      # deliberately non-power-of-two, non-zero-based
YMIN, YMAX = 1000, 1363


def _grid(step=7):
    return [(x, y) for x in range(XMIN, XMAX + 1, step)
            for y in range(YMIN, YMAX + 1, 2 * step + 1)]


def test_z_expr_spark_matches_python(spark):
    pts = _grid()
    df = spark.createDataFrame(pts, "x long, y long")
    expr = z_expr_sql("x", "y", str(XMIN), str(XMAX), str(YMIN), str(YMAX),
                      bits=BITS, dialect="spark")
    got = {(r.x, r.y): r.z
           for r in df.selectExpr("x", "y", f"{expr} AS z").collect()}
    for (x, y) in pts:
        assert got[(x, y)] == morton_py(x, y, XMIN, XMAX, YMIN, YMAX, BITS)


def test_z_expr_duckdb_matches_python():
    pts = _grid()
    expr = z_expr_sql("x", "y", str(XMIN), str(XMAX), str(YMIN), str(YMAX),
                      bits=BITS, dialect="duckdb")
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    got = {(x, y): z for x, y, z in
           con.execute(f"SELECT x, y, {expr} FROM pts").fetchall()}
    for (x, y) in pts:
        assert got[(x, y)] == morton_py(x, y, XMIN, XMAX, YMIN, YMAX, BITS)


def test_z_expr_unknown_dialect():
    with pytest.raises(ValueError):
        z_expr_sql("x", "y", "0", "1", "0", "1", dialect="postgres")


def _footer_ranges(path, cols):
    """Per-file (min, max) of each col straight from the parquet footers
    — what a real engine's scan pruning consults."""
    import pyarrow.parquet as pq
    from pathlib import Path
    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None \
                        else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None \
                        else max(maxs[name], st.max)
        if any(v is not None for v in mins.values()):
            out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


@pytest.mark.heavy
def test_zorder_write_footers_are_rectangles(spark, tmp_path):
    # 128x64 grid: u in [0,128), t in [0,64) — every (u,t) cell once
    rows = [(i, i % 128, i // 128) for i in range(128 * 64)]
    df = spark.createDataFrame(rows, "event_id long, u long, t long")

    zdir = str(tmp_path / "zorder")
    zorder_write(df, "u", "t", zdir, n_files=16, bits=7)
    tdir = str(tmp_path / "by_t")
    (df.repartitionByRange(16, "t").sortWithinPartitions("t")
       .write.mode("overwrite").parquet(tdir))

    zr = _footer_ranges(zdir, ["u", "t"])
    tr = _footer_ranges(tdir, ["u", "t"])
    assert len(zr) >= 8 and len(tr) >= 8

    def mean_extent(ranges, c):
        return sum(mx - mn for (mn, mx) in (r[c] for r in ranges)) \
            / len(ranges)

    # time-sorted layout: every file spans (almost) ALL users
    assert mean_extent(tr, "u") > 120
    # z-order: each file covers a small rectangle on BOTH dims —
    # 16 files over a 128x64 grid → ideal 32x32; allow generous slack
    # for range-boundary sampling
    assert mean_extent(zr, "u") < 64
    assert mean_extent(zr, "t") < 40


@pytest.mark.heavy
def test_cluster_files_pruning_order(spark):
    """On the sf0.001 events table the driver query's invariant holds:
    z-order touches fewer files than the adversarial linear sort on
    BOTH probe families (full cross-engine value check is the oracled
    events_zorder_pruning driver query at sf0.01)."""
    from llm_knowledge_graph_spark.plans.driver_queries import (
        q_events_zorder_pruning)
    rows = q_events_zorder_pruning(spark, "/root/testdata/sf0.001").collect()
    got = {(r.layout, r.probe_kind): r.files_touched for r in rows}
    assert got[("zorder", "user_point")] < got[("by_ts", "user_point")]
    assert got[("zorder", "hour_point")] < got[("by_user", "hour_point")]
    # and each linear sort is near-optimal on its OWN dimension —
    # the trade z-order balances
    assert got[("by_user", "user_point")] <= got[("zorder", "user_point")]
    assert got[("by_ts", "hour_point")] <= got[("zorder", "hour_point")]


def test_with_zvalue_and_cluster_files_schema(spark):
    df = spark.createDataFrame([(1, 5, 9), (2, 6, 8)],
                               "event_id long, u long, t long")
    z = with_zvalue(df, "u", "t", bits=4)
    assert set(z.columns) == {"event_id", "u", "t", "z"}
    f = cluster_files(z, ["z", "event_id"], 2)
    assert f.filter("file_id IS NULL").count() == 0
    assert f.select("file_id").distinct().count() == 2
