"""Z-order layout: the clustering must be measurable in parquet footer
stats — that is the entire point of the operator (multi-dim pruning),
and a regression here (e.g. the Morton key degenerating to a plain
sort) would silently keep queries correct but kill the 100 TB scan
story."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from data_ingestion_tool_spark.operators.zorder import zorder_write
from data_ingestion_tool_spark.sources.parquet_io import read_table


def _file_boxes(path: str, cols: list[str]) -> list[dict]:
    boxes = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for i in range(row.num_columns):
                col = row.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = (
                        s.min if mins[name] is None else min(mins[name], s.min)
                    )
                    maxs[name] = (
                        s.max if maxs[name] is None else max(maxs[name], s.max)
                    )
        boxes.append({c: (mins[c], maxs[c]) for c in cols})
    return boxes


def _mean_range_fraction(boxes: list[dict], col: str) -> float:
    gmin = min(b[col][0] for b in boxes)
    gmax = max(b[col][1] for b in boxes)
    span = max(gmax - gmin, 1)
    return sum((b[col][1] - b[col][0]) / span for b in boxes) / len(boxes)


def test_zorder_files_are_tight_boxes_on_both_dims(spark, sf_dir, tmp_path):
    cols = ["l_partkey", "l_suppkey"]
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", *cols, "l_quantity"
    )
    zdest = str(tmp_path / "z")
    zorder_write(l, cols, zdest)
    ndest = str(tmp_path / "n")
    l.repartitionByRange(8, "l_orderkey").write.mode("overwrite").parquet(
        ndest
    )

    zboxes = _file_boxes(zdest, cols)
    nboxes = _file_boxes(ndest, cols)
    assert len(zboxes) >= 4
    for c in cols:
        zf = _mean_range_fraction(zboxes, c)
        nf = _mean_range_fraction(nboxes, c)
        # natural (orderkey) layout spreads both dims over ~the full
        # range in every file; z-order must cut the mean file span on
        # BOTH clustered dims — not just the leading one like ORDER BY
        assert nf > 0.9, (c, nf)
        assert zf < 0.7, (c, zf)
    # row count preserved (layout only)
    assert spark.read.parquet(zdest).count() == l.count()


def test_zorder_rejects_single_column(spark, sf_dir, tmp_path):
    l = read_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="zorder"):
        zorder_write(l, ["l_partkey"], str(tmp_path / "z1"))
