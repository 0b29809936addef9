"""Partitioned writes must enable partition pruning on read."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackml_spark.sources import load_table
from quackml_spark.sources.sinks import (
    partition_filters,
    read_partitioned,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(ev, out, ["day"])

    back = read_partitioned(spark, out)
    one_day = back.where(F.col("day") == "2024-01-05")
    pf = partition_filters(one_day)
    assert "day" in pf, f"no partition filter applied: {pf!r}"

    # pruned read returns exactly the batch-filtered rows
    expected = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert one_day.count() == expected
    assert expected > 0


def test_zorder_layout_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """write_zorder must give file-level skipping on EVERY interleaved
    column: for a narrow range predicate on either column, most files'
    footer (min,max) must exclude the range. A single-key sorted layout
    only prunes its leading key — that asymmetry is what z-order buys."""
    from quackml_spark.sources.files import (
        file_key_ranges,
        write_sorted,
        write_zorder,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 16

    zpath = str(tmp_path / "orders_z")
    write_zorder(orders, zpath, ["o_custkey", "o_totalprice"], n_files, bits=8)

    spath = str(tmp_path / "orders_s")
    write_sorted(orders, spath, ["o_custkey"], n_files)

    lo_c, hi_c = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    lo_p, hi_p = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()

    def overlap_frac(path, col, lo, hi):
        ranges = file_key_ranges(path, col)
        assert ranges, f"no footer stats for {col} under {path}"
        hit = sum(1 for a, b in ranges if not (b < lo or a > hi))
        return hit / len(ranges)

    # a ~3%-wide slice of each key space
    width_c = (hi_c - lo_c) * 0.03
    width_p = (float(hi_p) - float(lo_p)) * 0.03
    q_c = (lo_c + (hi_c - lo_c) * 0.4, lo_c + (hi_c - lo_c) * 0.4 + width_c)
    q_p = (
        float(lo_p) + (float(hi_p) - float(lo_p)) * 0.4,
        float(lo_p) + (float(hi_p) - float(lo_p)) * 0.4 + width_p,
    )

    z_cust = overlap_frac(zpath, "o_custkey", *q_c)
    z_price = overlap_frac(zpath, "o_totalprice", *q_p)
    s_cust = overlap_frac(spath, "o_custkey", *q_c)
    s_price = overlap_frac(spath, "o_totalprice", *q_p)

    # the sorted layout is near-perfect on its own key and useless on
    # the other; z-order prunes meaningfully on BOTH.
    assert s_cust <= 0.25
    assert s_price >= 0.9, "price slice shouldn't prune a custkey sort"
    assert z_cust <= 0.75, f"z-order didn't prune custkey: {z_cust}"
    assert z_price <= 0.75, f"z-order didn't prune totalprice: {z_price}"
    # rows must round-trip unchanged
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
