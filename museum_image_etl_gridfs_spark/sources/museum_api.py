"""Custom Python DataSource: the museum REST API as a first-class
``spark.read.format("museum_api")`` connector (SURVEY.md S1/S2).

PySpark 4's DataSource API makes the reference's hand-rolled
HTTP loop a real catalog-visible source: the id list is split into
``partitions`` input splits, each executor fetches its batch of
per-id JSON documents, and rows come back through Arrow like any
other scan. Registration:

    spark.dataSource.register(MuseumApiDataSource)
    df = (spark.read.format("museum_api")
          .option("ids", "1,2,3")
          .option("base_url", "https://api.example.test/objects")
          .load())

Transports: executors default to the stdlib urllib transport
(sources/http.py). For hermetic tests, ``option("canned_json",
'{"1": {...}}')`` serves responses from an in-options dict — the
same code path minus the socket.

Scale: one split per ``partitions`` option (default parallelism);
a 480 K-id catalog fans out across the cluster instead of the
reference's single blocking loop at ~0.3-2.5 s/artwork
(src/ingestion.py:38-57, BASELINE.md).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _IdRange(InputPartition):
    def __init__(self, ids: Sequence[int]):
        self.ids = list(ids)


class MuseumApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.base_url = options.get("base_url", "")
        self.ids = [int(x) for x in options.get("ids", "").split(",") if x.strip()]
        self.n_partitions = int(options.get("partitions", "8"))
        self.canned = (
            json.loads(options["canned_json"]) if "canned_json" in options else None
        )

    def partitions(self) -> Sequence[InputPartition]:
        if not self.ids:
            return [_IdRange([])]
        n = max(min(self.n_partitions, len(self.ids)), 1)
        step = -(-len(self.ids) // n)
        return [
            _IdRange(self.ids[i : i + step]) for i in range(0, len(self.ids), step)
        ]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        if self.canned is not None:
            def fetch(i: int) -> tuple[int, str]:
                doc = self.canned.get(str(i))
                return (200, json.dumps(doc)) if doc is not None else (404, "")
        else:  # pragma: no cover - live-network path
            from .http import default_transport

            def fetch(i: int) -> tuple[int, str]:
                status, body = default_transport(f"{self.base_url}/{i}")
                return status, body.decode("utf-8", errors="replace")

        for i in partition.ids:
            status, body = fetch(i)
            yield (i, status, body)


class MuseumApiDataSource(DataSource):
    """``format("museum_api")`` — id-partitioned REST document scan."""

    @classmethod
    def name(cls) -> str:
        return "museum_api"

    def schema(self) -> str:
        return "object_id long, status int, body string"

    def reader(self, schema: StructType) -> MuseumApiReader:
        return MuseumApiReader(self.options)
