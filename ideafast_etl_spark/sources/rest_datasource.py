"""Custom PySpark DataSource for paginated REST ingest (SURVEY.md §2.1 S1 /
§4 custom-work item 2 — the scale path beyond the driver-side cursor walk in
:mod:`.rest`).

When the vendor API supports offset addressing (ours does: the cursor IS the
offset — reference pagination envelope drm.py:41-46), the scan can be
partitioned into offset ranges and fetched BY EXECUTORS in parallel — the
driver never touches row data. Registration:

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("paginated_rest")
          .option("total_records", 1000).option("page_size", 30).load())

This implementation binds to the deterministic mock vendor API (no network in
this environment); a real one would read endpoint/credentials from options
and open one HTTP session per partition. Schema is the flattened API row
(report struct flattened to start_time/stop_time).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FLAT_SCHEMA = (
    "id string, device string, start_time long, stop_time long, data_url string"
)


class _OffsetRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RestDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total = int(options.get("total_records", "0"))
        self.page_size = int(options.get("page_size", "30"))
        self.num_partitions = int(options.get("num_partitions", "8"))

    def partitions(self) -> list[InputPartition]:
        if self.total <= 0:
            return [_OffsetRange(0, 0)]
        per = max(self.page_size, -(-self.total // self.num_partitions))
        return [
            _OffsetRange(lo, min(lo + per, self.total))
            for lo in range(0, self.total, per)
        ]

    def read(self, partition: _OffsetRange) -> Iterator[tuple]:
        # executor-side: walk pages within this partition's offset range only
        from .rest import mock_dreem_api

        fetch = mock_dreem_api(self.total, self.page_size)
        cursor: str | None = str(partition.start) if partition.start else None
        seen = partition.start
        while seen < partition.end:
            rows, cursor = fetch(cursor)
            for r in rows:
                if seen >= partition.end:
                    break
                yield (
                    r["id"],
                    r["device"],
                    r["report"]["start_time"],
                    r["report"]["stop_time"],
                    r["data_url"],
                )
                seen += 1
            if cursor is None:
                break


class RestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> str:
        return FLAT_SCHEMA

    def reader(self, schema) -> RestDataSourceReader:
        return RestDataSourceReader(self.options)
