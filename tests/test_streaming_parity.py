"""Streaming ↔ batch parity gate: the batch wave loop is oracle-exact
(crawl order + seen set vs the single-process oracle), so asserting the
Structured-Streaming operators reproduce the batch operators on
identical input gives the streaming family a transitive hard oracle —
the one operator family previously outside the 30-query driver gate.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


class TestStreamingBatchParity:
    def test_politeness_stream_equals_batch_dequeue_two_waves(
        self, spark, tmp_path
    ) -> None:
        """politeness_stream (applyInPandasWithState) must admit EXACTLY
        the rows politeness_dequeue admits, for two consecutive waves —
        including the GroupState token carry between triggers (matching
        the batch host_state update)."""
        from parsel_spark.operators.frontier import (
            INITIAL_TOKENS,
            politeness_dequeue,
        )
        from parsel_spark.streaming.stream_crawl import politeness_stream

        hosts = [
            ("h0.test", 1.0, 3),   # fast host, deep budget
            ("h1.test", 2.0, 8),   # slow refill
            ("h2.test", 0.5, 1),   # fast refill, mf-bound
            ("h3.test", 1.0, 8),   # few candidates (avail-bound)
        ]
        host_state = spark.createDataFrame(
            [(h, INITIAL_TOKENS, d, mf) for h, d, mf in hosts],
            "host string, tokens double, crawl_delay double, "
            "max_fetch_per_wave int",
        )
        rows = []
        for hi, (host, delay, mf) in enumerate(hosts):
            n = [9, 5, 4, 1][hi]
            for i in range(n):
                rows.append(
                    (
                        f"http://{host}/p/{i}",
                        (hi * 37 + i * 101) % 1000 - 500,  # url_hash
                        host,
                        float((i * 7) % 3),  # priorities with ties
                        (i * 13) % 5,  # seq with ties
                        0,
                    )
                )
        frontier = spark.createDataFrame(
            rows,
            "url string, url_hash long, host string, priority double, "
            "seq long, discovered_wave int",
        )

        # -- batch reference: two waves
        batch_waves = []
        state = host_state
        remaining = frontier
        for _ in range(2):
            dequeued, state = politeness_dequeue(remaining, state)
            got = {r["url"] for r in dequeued.collect()}
            batch_waves.append(got)
            remaining = remaining.join(
                spark.createDataFrame([(u,) for u in got], "url string"),
                "url",
                "left_anti",
            )

        # -- streaming: same candidates arrive as two triggers over the
        # SAME checkpoint (GroupState carries tokens like host_state)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        chk = str(tmp_path / "chk")
        out_dir = str(tmp_path / "out")
        delays = {h: (d, mf) for h, d, mf in hosts}
        stream_waves: list[set[str]] = []
        seen_so_far: set[str] = set()
        for wave, batch_got in enumerate(batch_waves):
            wave_rows = [
                {
                    "url": u,
                    "url_hash": uh,
                    "host": h,
                    "priority": p,
                    "seq": s,
                    "crawl_delay": delays[h][0],
                    "max_fetch_per_wave": delays[h][1],
                }
                for (u, uh, h, p, s, _w) in rows
                if u not in seen_so_far
            ]
            spark.createDataFrame(pd.DataFrame(wave_rows)).coalesce(1).write.parquet(
                str(in_dir / f"b{wave}")
            )
            stream = spark.readStream.schema(
                "url string, url_hash long, host string, priority double, "
                "seq long, crawl_delay double, max_fetch_per_wave long"
            ).parquet(str(in_dir / "b*"))
            gated = politeness_stream(stream)
            query = (
                gated.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination(120)
            allowed_all = {
                r["url"]
                for r in spark.read.parquet(out_dir).collect()
                if r["allowed"]
            }
            stream_waves.append(allowed_all - seen_so_far)
            seen_so_far |= allowed_all

        assert stream_waves[0] == batch_waves[0]
        assert stream_waves[1] == batch_waves[1]

    def test_extract_stream_equals_batch_extract(self, spark, tmp_path) -> None:
        """extract_link_stream over a one-batch page stream must produce
        exactly the batch extract_wave_links + dropDuplicates output
        (urls AND xxhash64 keys) — same fused UDF, same canonicalizer,
        streaming dedup == batch dedup."""
        from parsel_spark.operators.frontier import extract_wave_links
        from parsel_spark.sources.synth import SynthConfig, synth_pages
        from parsel_spark.streaming.stream_crawl import (
            extract_link_stream,
            read_page_stream,
        )

        cfg = SynthConfig(
            n_pages=150, n_hosts=10, out_degree=5, seed=11, with_images=False
        )
        pages = synth_pages(spark, cfg).select("url", "host", "html")
        batch = {
            (r["url"], r["url_hash"])
            for r in extract_wave_links(pages.select("url", "html"))
            .dropDuplicates(["url"])
            .collect()
        }

        in_dir = str(tmp_path / "pages")
        pages.withColumn(
            "fetched_at", F.lit("2026-01-01 00:00:00").cast("timestamp")
        ).write.parquet(in_dir)
        stream = extract_link_stream(read_page_stream(spark, in_dir))
        query = (
            stream.writeStream.format("memory")
            .queryName("extract_parity")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        streamed = {
            (r["url"], r["url_hash"])
            for r in spark.sql(
                "select url, url_hash from extract_parity"
            ).collect()
        }
        assert streamed == batch
        assert batch  # non-trivial corpus


def test_politeness_stream_refill_catchup_over_absence(spark, tmp_path) -> None:
    """A host ABSENT from intermediate triggers must not lose refills:
    the batch loop refills every host every wave (host_state_update),
    so when the input carries the wave index the gate catches up
    (wave-gap refills at once — min-cap commutes with summed additions).
    Scenario engineered so the gap CHANGES the admit count: host B
    (delay 1.0) banks two waves of tokens while absent and must admit
    k=2 on reappearance (a single-refill gate would admit 1)."""
    import pandas as pd

    from parsel_spark.operators.frontier import (
        FRONTIER_SCHEMA,
        HOST_STATE_SCHEMA,
        INITIAL_TOKENS,
        host_state_update,
        politeness_split,
    )
    from parsel_spark.streaming.stream_crawl import politeness_stream
    from pyspark.sql import functions as F

    def mk_rows(wave: int, spec: dict[str, list[str]]):
        rows = []
        for host, urls in spec.items():
            for i, u in enumerate(urls):
                seq = wave * 100 + i
                rows.append((f"http://{host}/{u}", seq, host, 1.0, seq, 0))
        return rows

    wave_specs = {
        1: {"a.test": ["a0", "a1", "a2"], "b.test": [f"b{i}" for i in range(6)]},
        2: {"a.test": ["a3", "a4"]},
        3: {"a.test": ["a5"], "b.test": [f"b{i}" for i in range(6, 10)]},
    }

    # -- batch reference: the wave loop's exact operators
    host_state = spark.createDataFrame(
        [("a.test", INITIAL_TOKENS, 1.0, 8), ("b.test", INITIAL_TOKENS, 1.0, 8)],
        HOST_STATE_SCHEMA,
    )
    batch_waves = []
    for wave in (1, 2, 3):
        frontier = spark.createDataFrame(mk_rows(wave, wave_specs[wave]), FRONTIER_SCHEMA)
        flagged = politeness_split(frontier, host_state, skew_prune=False)
        dequeued = flagged.filter(F.col("dequeued")).select(
            "url", "url_hash", "host", "priority", "seq", "discovered_wave"
        )
        batch_waves.append({r["url"] for r in dequeued.collect()})
        host_state = host_state_update(host_state, dequeued)
    # sanity: the scenario really banks tokens (B admits 2 on return)
    assert sum(1 for u in batch_waves[2] if "b.test" in u) == 2

    # -- streaming: one file per trigger, wave column carried
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    stream_waves = []
    seen: set[str] = set()
    for wave in (1, 2, 3):
        rows = [
            {
                "host": h,
                "url": u,
                "url_hash": uh,
                "priority": p,
                "seq": s,
                "crawl_delay": 1.0,
                "max_fetch_per_wave": 8,
                "wave": wave,
            }
            for (u, uh, h, p, s, _w) in mk_rows(wave, wave_specs[wave])
        ]
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
            str(in_dir / f"w{wave}")
        )
        stream = spark.readStream.schema(
            "host string, url string, url_hash long, priority double, "
            "seq long, crawl_delay double, max_fetch_per_wave long, wave long"
        ).parquet(str(in_dir / "w*"))
        query = (
            politeness_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        allowed = {
            r["url"]
            for r in spark.read.parquet(out_dir).collect()
            if r["allowed"]
        }
        stream_waves.append(allowed - seen)
        seen |= allowed

    assert stream_waves == batch_waves


class TestDedupStream:
    """Stateful streaming exact dedup: one-trigger parity with batch
    exact_dedup; cross-trigger suppression via GroupState."""

    def _write(self, spark, path, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(path)

    def _start(self, spark, in_dir, out_dir, chk):
        from parsel_spark.streaming.stream_crawl import dedup_stream

        stream = dedup_stream(
            spark.readStream.schema("doc_id long, text string").parquet(in_dir)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    def test_single_trigger_equals_batch_exact_dedup(
        self, spark, tmp_path
    ) -> None:
        from parsel_spark.operators.dedup import exact_dedup

        rows = [(i, f"text-{i % 40}") for i in range(120)]
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        self._write(spark, in_dir, rows)
        self._start(
            spark, in_dir, out_dir, str(tmp_path / "chk")
        ).awaitTermination(120)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        batch = {
            (r["doc_id"], r["dup_count"]) for r in exact_dedup(docs).collect()
        }
        streamed = {
            (r["doc_id"], r["dup_count"])
            for r in spark.read.parquet(out_dir).collect()
        }
        assert streamed == batch and len(batch) == 40

    def test_second_trigger_suppresses_seen_hashes(
        self, spark, tmp_path
    ) -> None:
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        chk = str(tmp_path / "chk")
        self._write(spark, in_dir, [(1, "alpha"), (2, "alpha"), (3, "beta")])
        self._start(spark, in_dir, out_dir, chk).awaitTermination(120)
        first = {
            (r["text_md5"], r["doc_id"], r["dup_count"])
            for r in spark.read.parquet(out_dir).collect()
        }
        assert {(d, c) for _, d, c in first} == {(1, 2), (3, 1)}

        # trigger 2: one seen text (suppressed) + one new (emitted)
        self._write(spark, in_dir, [(9, "alpha"), (10, "gamma")])
        self._start(spark, in_dir, out_dir, chk).awaitTermination(120)
        second = {
            (r["text_md5"], r["doc_id"], r["dup_count"])
            for r in spark.read.parquet(out_dir).collect()
        }
        new = second - first
        assert {(d, c) for _, d, c in new} == {(10, 1)}

    def test_string_ids_supported(self, spark, tmp_path) -> None:
        from parsel_spark.streaming.stream_crawl import dedup_stream

        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        spark.createDataFrame(
            [("b", "x"), ("a", "x")], "doc_id string, text string"
        ).coalesce(1).write.parquet(in_dir)
        stream = dedup_stream(
            spark.readStream.schema("doc_id string, text string").parquet(
                in_dir
            )
        )
        (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        ).awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        assert len(rows) == 1
        assert rows[0]["doc_id"] == "a" and rows[0]["dup_count"] == 2
