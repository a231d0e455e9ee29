"""WARC-style page archive as a Spark Python DataSource (Spark 4
custom data-source API): ``spark.read.format("warcpages")`` /
``df.write.format("warcpages")`` over self-contained record shards.

Why a custom source: the engine's production input is a Common-Crawl-
style archive, and Common Crawl ships as WARC — a sequential
record-per-response container no built-in Spark reader understands.
This module implements a WARC/1.0-shaped record format (named headers,
Content-Length-framed binary payload, so payload bytes are opaque and
need no escaping) and wires it into Spark's planner through the
official DataSource API:

* **partition planning**: one InputPartition per shard file — the
  driver lists filenames only; payload bytes are read inside executor
  tasks. At 100 TB this is the standard many-shards → many-tasks scan
  (a manifest written at commit time makes the listing O(1) and the
  committed set atomic).
* **filter pushdown**: ``pushFilters`` accepts EqualTo/In on ``lang``
  and EqualTo on ``url``; accepted predicates are applied DURING
  record parsing from the cheap headers, before html payload bytes
  are materialized into Arrow rows — so ``.filter(lang='en')``
  reaches the byte scanner, the same contract parquet gets from
  Catalyst. Everything else is returned to Spark unchanged.
* **distributed write**: DataSourceWriter runs per-partition on
  executors (one shard per task, temp-file + atomic rename), and the
  driver-side ``commit`` writes a manifest naming exactly the shards
  that belong to the dataset — stragglers/retries that lost the race
  are not listed, mirroring sources.catalog's atomic-commit contract.
  ``mode('append')`` keeps committed shards and merges manifests (the
  incremental-crawl pattern); ``mode('overwrite')`` replaces the set.

Record layout (one record; shard = concatenation of records):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <warc_ts isoformat>\r\n
    WARC-Page-Lang: <lang>\r\n
    Content-Length: <len(html)>\r\n
    \r\n
    <html bytes>\r\n\r\n

Schema: ``url string, warc_ts timestamp, lang string, html binary``
(the archival columns — extracted/gold text never lives in a crawl
archive).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from datetime import datetime
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

FORMAT_NAME = "warcpages"
MANIFEST = "_WARC_MANIFEST.json"
_CRLF = b"\r\n"


def _encode_record(url: str, ts: datetime, lang: str, html: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.isoformat()}\r\n"
        f"WARC-Page-Lang: {lang}\r\n"
        f"Content-Length: {len(html)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + html + _CRLF + _CRLF


def _parse_shard(
    data: bytes,
    want_lang: set[str] | None,
    want_url: str | None,
) -> Iterator[tuple[str, datetime, str, bytes]]:
    """Content-Length-framed parse; header-level predicate evaluation
    happens BEFORE the payload is sliced out (pushdown surface)."""
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        body_start = head_end + 4
        clen = int(headers["Content-Length"])
        pos = body_start + clen + 4  # skip payload + record separator
        lang = headers["WARC-Page-Lang"]
        url = headers["WARC-Target-URI"]
        if want_lang is not None and lang not in want_lang:
            continue
        if want_url is not None and url != want_url:
            continue
        yield (
            url,
            datetime.fromisoformat(headers["WARC-Date"]),
            lang,
            data[body_start : body_start + clen],
        )


class WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warcpages: a path is required")
        self.path = path
        self.want_lang: set[str] | None = None
        self.want_url: str | None = None

    def _shards(self) -> list[str]:
        manifest = os.path.join(self.path, MANIFEST)
        if os.path.exists(manifest):
            with open(manifest) as f:
                names = json.load(f)["shards"]
            return [os.path.join(self.path, s) for s in names]
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".warc")
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("lang",):
                self.want_lang = {f.value}
            elif isinstance(f, In) and f.attribute == ("lang",):
                self.want_lang = set(f.value)
            elif isinstance(f, EqualTo) and f.attribute == ("url",):
                self.want_url = f.value
            else:
                yield f  # unsupported — Spark keeps evaluating it

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(p) for p in self._shards()]

    def read(self, partition: InputPartition):
        with open(partition.value, "rb") as f:
            data = f.read()
        yield from _parse_shard(data, self.want_lang, self.want_url)


@dataclass
class WarcCommit(WriterCommitMessage):
    shard: str
    n_records: int


class WarcWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warcpages: a path is required")
        self.path = path
        # driver-side setup. Spark's Python sources expose exactly two
        # batch modes: Overwrite clears the committed set; Append keeps
        # the committed shards and merges manifests at commit time (the
        # incremental-crawl pattern — each crawl increment is a new
        # shard set under one dataset manifest).
        self._prior_shards: list[str] = []
        self._prior_records = 0
        manifest = os.path.join(path, MANIFEST)
        if os.path.exists(manifest):
            if overwrite:
                os.remove(manifest)
                for f in os.listdir(path):
                    if f.endswith(".warc"):
                        os.remove(os.path.join(path, f))
            else:
                with open(manifest) as f:
                    prior = json.load(f)
                self._prior_shards = prior["shards"]
                self._prior_records = prior["n_records"]
        os.makedirs(path, exist_ok=True)

    def write(self, iterator: Iterator[Row]) -> WarcCommit:
        """Runs inside an executor task: one shard per input partition,
        temp-file + atomic rename (a torn task retry never leaves a
        half shard under a committed name)."""
        name = f"part-{uuid.uuid4().hex}.warc"
        tmp = os.path.join(self.path, f".{name}.tmp")
        n = 0
        with open(tmp, "wb") as f:
            for row in iterator:
                f.write(
                    _encode_record(row.url, row.warc_ts, row.lang, row.html)
                )
                n += 1
        if n == 0:
            os.remove(tmp)
            return WarcCommit(shard="", n_records=0)
        os.replace(tmp, os.path.join(self.path, name))
        return WarcCommit(shard=name, n_records=n)

    def commit(self, messages: list[WarcCommit]) -> None:
        # commit-ordered, not globally sorted: the manifest doubles as
        # an append LOG so streaming offsets (= prefix lengths into
        # this list) stay stable across later appends
        shards = self._prior_shards + sorted(
            m.shard for m in messages if m.n_records > 0
        )
        total = self._prior_records + sum(m.n_records for m in messages)
        tmp = os.path.join(self.path, f".{MANIFEST}.tmp")
        with open(tmp, "w") as f:
            json.dump({"shards": shards, "n_records": total}, f, indent=1)
        os.replace(tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages: list[WarcCommit]) -> None:
        for m in messages:
            if m.n_records > 0:
                try:
                    os.remove(os.path.join(self.path, m.shard))
                except OSError:
                    pass


class WarcStreamReader(DataSourceStreamReader):
    """Streaming ingestion over the same archive: the manifest is an
    append log (commit-ordered shard list), so an OFFSET is simply a
    prefix length into it. Each micro-batch covers the shards appended
    since the last committed prefix — one InputPartition per new shard,
    read on executors exactly like the batch path. This is the
    continuous-crawl shape: a crawler appends shard sets with
    ``mode('append')``; the streaming job picks each increment up
    exactly once (offset tracking rides Spark's checkpoint)."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warcpages: a path is required")
        self.path = path

    def _manifest_shards(self) -> list[str]:
        manifest = os.path.join(self.path, MANIFEST)
        if not os.path.exists(manifest):
            return []
        with open(manifest) as f:
            return json.load(f)["shards"]

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._manifest_shards())}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        shards = self._manifest_shards()
        return [
            InputPartition(os.path.join(self.path, s))
            for s in shards[start["idx"] : end["idx"]]
        ]

    def read(self, partition: InputPartition):
        with open(partition.value, "rb") as f:
            data = f.read()
        yield from _parse_shard(data, None, None)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class WarcPagesDataSource(DataSource):
    """``spark.dataSource.register(WarcPagesDataSource)`` then
    ``spark.read.format('warcpages').load(path)`` /
    ``df.write.format('warcpages').mode(...).save(path)`` /
    ``spark.readStream.format('warcpages').load(path)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "url string, warc_ts timestamp, lang string, html binary"

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcWriter:
        return WarcWriter(self.options, overwrite)

    def streamReader(self, schema: StructType) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    # reader implements pushFilters, which Spark gates behind a session
    # conf (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcPagesDataSource)
