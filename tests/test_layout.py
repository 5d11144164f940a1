"""Z-order layout (operators/layout.py): interleave correctness and a
quantitative file-skipping measurement against a random layout."""

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.layout import bucketize, zorder_key, zorder_write
from ideafast_etl_spark.tables import load


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (255, 255)], "x long, y long")
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    # x -> even bit positions, y -> odd: (3, 1) = 0b11 even + 0b1 odd = 0b111
    assert out[(3, 1)] == 0b111
    assert out[(0, 0)] == 0
    assert out[(255, 255)] == (1 << 16) - 1


def test_bucketize_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (50.0,), (999.0,)], "v double")
    vals = [
        r.b
        for r in df.select(bucketize(F.col("v"), 0.0, 100.0, bits=4).alias("b"))
        .orderBy("v")
        .collect()
    ]
    assert vals == [0, 8, 15]


def _per_file_widths(path, cols):
    widths = {c: [] for c in cols}
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for i in range(md.num_columns):
                col = md.row_group(rg).column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        for c in cols:
            widths[c].append(float(maxs[c]) - float(mins[c]))
    return widths


def test_zorder_layout_narrows_minmax_in_both_dims(spark, tmp_path):
    ev = load(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "user_id", "value"
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    # a clustering writer buckets against the actual data bounds
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    zorder_write(
        ev,
        zpath,
        "user_id",
        "value",
        (float(lo_u), float(hi_u) + 1),
        (float(lo_v), float(hi_v) + 1e-6),
        n_files=8,
        bits=8,
    )
    ev.repartition(8).write.mode("overwrite").parquet(rpath)

    zw = _per_file_widths(zpath, ["user_id", "value"])
    rw = _per_file_widths(rpath, ["user_id", "value"])
    assert len(zw["user_id"]) == 8
    for c in ("user_id", "value"):
        z_mean = sum(zw[c]) / len(zw[c])
        r_mean = sum(rw[c]) / len(rw[c])
        # every random-layout file spans ~the full range; Z-order files
        # must be materially narrower in BOTH dimensions simultaneously
        assert z_mean < 0.7 * r_mean, (c, z_mean, r_mean)


def test_zorder_key_is_injective_on_the_grid(spark):
    grid = spark.range(16).selectExpr("id as x").crossJoin(
        spark.range(16).selectExpr("id as y")
    )
    z = grid.select(zorder_key(F.col("x"), F.col("y"), bits=4).alias("z"))
    assert z.distinct().count() == 256  # bijection onto [0, 2^8)
    mn, mx = z.agg(F.min("z"), F.max("z")).first()
    assert (mn, mx) == (0, 255)
