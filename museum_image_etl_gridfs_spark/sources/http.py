"""Batch-HTTP ingestion source (SURVEY.md S1-S3).

The reference fetches the MET object-id list, then per-id JSON
details, then the primary image bytes — sequentially, one blocking
request at a time (src/ingestion.py:25-57). Here each step is a
distributed mapInPandas stage: ids are partitioned across executors
and each partition issues its batch of requests, so throughput scales
with cores instead of being capped at 1 req/RTT.

The transport is injectable (``fetch: url -> (status, bytes)``) so
tests run hermetically and the oracle path never touches a network.
The default transport uses urllib from the Python stdlib and is only
invoked when a caller actually streams from a live API — never in
tests or driver checks.

Scale notes: per-partition sequential HTTP with N partitions ≈ N
concurrent connections cluster-wide — tune with ``num_partitions``;
failures become status-code rows (PERMISSIVE convention, §2.11), not
task failures, so one bad URL cannot kill a 100 TB ingest.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Transport = Callable[[str], tuple[int, bytes]]


def default_transport(url: str, timeout: float = 30.0) -> tuple[int, bytes]:
    """stdlib urllib GET -> (status, body). Only used against a live
    API; tests inject a fake."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a status
        return e.code, b""
    except Exception:  # noqa: BLE001 - network failure -> status 0 row
        return 0, b""


def ids_dataframe(spark: SparkSession, ids: list[int]) -> DataFrame:
    """S1: the id list as a DataFrame (the reference materializes
    ``objectIDs`` in driver memory; a real deployment would read it
    from a table/file — this constructor covers the API-list case)."""
    return spark.createDataFrame([(i,) for i in ids], "object_id long")


def fetch_json(
    ids: DataFrame,
    url_for: Callable[[int], str],
    transport: Transport,
    *,
    id_col: str = "object_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """S2: per-key REST fetch — a correlated lookup join against the
    API, executed as partition-batched HTTP.

    Returns (id, status, body). Rows keep non-200 statuses
    (PERMISSIVE: filter with ``status == 200`` downstream, F1).
    """
    if num_partitions is None:
        num_partitions = ids.sparkSession.sparkContext.defaultParallelism

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_id, out_status, out_body = [], [], []
            for i in pdf[id_col]:
                status, body = transport(url_for(int(i)))
                out_id.append(int(i))
                out_status.append(status)
                out_body.append(body.decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {id_col: out_id, "status": out_status, "body": out_body}
            )

    return ids.repartition(num_partitions, F.col(id_col)).mapInPandas(
        fetch, f"{id_col} long, status int, body string"
    )


def fetch_binary(
    df: DataFrame,
    url_col: str,
    transport: Transport,
    *,
    out_col: str = "data",
    num_partitions: int | None = None,
) -> DataFrame:
    """S3: fetch a binary blob per row from ``url_col``.

    Adds (``{out_col}_status`` int, ``out_col`` binary); empty/NULL
    URLs yield status 0 without a request (F2 truthiness filter is
    left to the caller so the quarantine row survives)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    in_schema = df.schema

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            statuses, blobs = [], []
            for url in pdf[url_col]:
                if not url:
                    statuses.append(0)
                    blobs.append(None)
                    continue
                status, body = transport(url)
                statuses.append(status)
                blobs.append(body)
            pdf = pdf.copy()
            pdf[f"{out_col}_status"] = pd.Series(statuses, index=pdf.index)
            pdf[out_col] = pd.Series(blobs, index=pdf.index)
            yield pdf

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    )
    return df.repartition(num_partitions).mapInPandas(
        fetch, f"{out_fields}, {out_col}_status int, {out_col} binary"
    )


def project_metadata(
    fetched: DataFrame, field_map: dict[str, str], source_label: str
) -> DataFrame:
    """P1/C2: parse the JSON body and project/rename fields, adding
    the literal ``source`` and ``created_at`` timestamp — the Spark
    form of the reference's row-building loop (src/ingestion.py:70-83).
    """
    schema = ", ".join(f"`{api}` string" for api in field_map)
    parsed = fetched.select(
        "*", F.from_json("body", schema).alias("__doc")
    )
    cols = [
        F.col(f"__doc.`{api}`").alias(alias) for api, alias in field_map.items()
    ]
    return parsed.select(
        F.col("object_id"),
        *cols,
        F.lit(source_label).alias("source"),
        F.current_timestamp().alias("created_at"),
    )


def make_json_transport(pages: dict[str, dict]) -> Transport:
    """Hermetic fake transport for tests: url -> canned JSON page
    (404 + empty body for unknown urls)."""

    def fetch(url: str) -> tuple[int, bytes]:
        if url in pages:
            return 200, json.dumps(pages[url]).encode()
        return 404, b""

    return fetch
