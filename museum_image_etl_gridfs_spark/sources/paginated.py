"""Cursor-paginated REST ingestion as a Spark 4 Python UDTF.

The id-partitioned DataSource (``sources/museum_api.py``) covers APIs
where the id list is enumerable upfront. Many real APIs are not like
that: they hand you an opaque ``next`` cursor per page and nothing
else (the reference's search-then-fetch loop, src/ingestion.py:38-57,
is the degenerate single-cursor case). A cursor chain is inherently
sequential — page N's address is only known after page N-1 — so the
unit of parallelism must be the CHAIN, not the page.

The Spark-first shape: one UDTF call walks ONE chain to exhaustion;
scale-out comes from LATERAL-joining the UDTF against a DataFrame of
chain seeds (per-collection, per-shard, per-date cursors). S seed
rows fan out across the cluster and each executor walks its chains
independently:

    spark.udtf.register("fetch_pages", make_paginated_fetch_udtf())
    df = spark.sql('''
        SELECT s.source, p.*
        FROM seeds s, LATERAL fetch_pages(s.url, s.cursor, 100) p
    ''')

Transports are injectable exactly like ``sources/http.py``: the
default is stdlib urllib on the executor; tests pass a canned
``{url -> (status, body)}`` callable, same code path minus the
socket. Page contract: each fetch returns JSON
``{"items": [...], "next": "<cursor>" | null}``; items are emitted
as raw JSON strings for downstream ``from_json`` (schema stays a
query-side concern, as in the DataSource).

Politeness/robustness knobs deliberately live in the transport
(retry, backoff, auth) — the UDTF only owns chain-walking: follow
``next`` until null, a page budget, or a non-200 (emitted as a
terminal error row so a 100 TB ingest distinguishes "chain done"
from "chain broken" without grepping executor logs).
"""

from __future__ import annotations

import json
from collections.abc import Callable

Transport = Callable[[str], tuple[int, bytes]]


def make_paginated_fetch_udtf(transport: Transport | None = None):
    """Build the chain-walking UDTF class (un-decorated registration
    left to the caller, like ``functions/chunking.make_chunk_udtf``).

    Output rows: ``(page, item_idx, status, item)`` — ``item`` is the
    raw item JSON on status 200, or the error body on the terminal
    non-200 row (``item_idx = -1``).
    """
    from pyspark.sql.functions import udtf

    if transport is None:  # pragma: no cover - live-network path
        def transport(url: str) -> tuple[int, bytes]:
            from .http import default_transport

            return default_transport(url)

    @udtf(returnType="page int, item_idx int, status int, item string")
    class PaginatedFetchUDTF:
        def eval(self, base_url: str | None, cursor: str | None, max_pages: int):
            if not base_url:
                return
            page = 0
            while cursor is not None and page < max_pages:
                status, body = transport(f"{base_url}?cursor={cursor}")
                if status != 200:
                    yield page, -1, status, body.decode("utf-8", "replace")
                    return
                doc = json.loads(body)
                for idx, item in enumerate(doc.get("items", [])):
                    yield page, idx, 200, json.dumps(item)
                cursor = doc.get("next")
                page += 1

    return PaginatedFetchUDTF


def canned_transport(pages: dict[str, tuple[int, dict]]) -> Transport:
    """Hermetic transport: ``{url: (status, page_doc)}``. Unknown
    urls 404 — the chain-broken path is testable too."""

    def fetch(url: str) -> tuple[int, bytes]:
        if url not in pages:
            return 404, b'{"error": "not found"}'
        status, doc = pages[url]
        return status, json.dumps(doc).encode()

    return fetch
