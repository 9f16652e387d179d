"""Ingest-time corpus bucketing: the once-at-ingest hash(url) shuffle
that lets every later crawl run's fetch join scan the corpus with NO
corpus-side exchange (the 100 TB alternative to prepare_pages's cache)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed(spark, tmp_path):
    from parsel_spark.sources.ingest import write_bucketed_corpus

    # spark.sql.warehouse.dir is static per-JVM; tables land in the
    # session's default warehouse (./spark-warehouse, gitignored) and
    # are dropped on teardown
    pages = spark.createDataFrame(
        [
            (f"http://h{i % 5}.test/p/{i}", f"<a href='/p/{i + 1}'>n</a>")
            for i in range(400)
        ],
        "url string, html string",
    )
    name = "corpus_bucketed_test"
    write_bucketed_corpus(pages, name, n_buckets=8)
    yield name, pages
    spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestBucketedCorpus:
    def test_roundtrip_rows(self, spark, bucketed) -> None:
        from parsel_spark.sources.ingest import read_bucketed_corpus

        name, pages = bucketed
        back = read_bucketed_corpus(spark, name)
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in pages.collect()
        }

    def test_fetch_join_corpus_side_exchange_free(self, spark, bucketed) -> None:
        """THE property bucketing buys: a url-keyed join against the
        bucketed table plans a bucket-aware scan (Bucketed: true) and
        the ONLY exchange is the small frontier side — the html column
        never moves."""
        from parsel_spark.sources.ingest import read_bucketed_corpus

        name, _pages = bucketed
        corpus = read_bucketed_corpus(spark, name)
        frontier = spark.createDataFrame(
            [(f"http://h{i % 5}.test/p/{i}",) for i in range(0, 400, 7)],
            "url string",
        )
        joined = corpus.join(frontier.hint("SHUFFLE_HASH"), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly one exchange, and it is the frontier side (the scan
        # of the parquet corpus is not under any Exchange)
        assert plan.count("Exchange hashpartitioning") == 1
        corpus_scan = plan.index("FileScan parquet")
        exchange = plan.index("Exchange hashpartitioning")
        assert exchange > corpus_scan  # exchange sits on the other branch
        assert joined.count() == len(range(0, 400, 7))

    def test_bucket_spec_persisted_in_catalog(self, spark, bucketed) -> None:
        """The bucket spec is table metadata — every future session
        (and executor count) sees the same 8-bucket hash(url) layout."""
        name, _ = bucketed
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }
        assert desc.get("Num Buckets") == "8"
        assert "url" in desc.get("Bucket Columns", "")
        assert "url" in desc.get("Sort Columns", "")


class TestSitemapSeeding:
    def test_sitemap_to_crawl_wave(self, spark, tmp_path) -> None:
        """Sitemap XML -> seeds_from_sitemaps -> CrawlRun.initialize ->
        one wave: the crawl dequeues exactly the sitemap's pages and
        extracts their links (full discovery-path integration)."""
        from parsel_spark.plans.crawl import CrawlRun, seeds_from_sitemaps
        from parsel_spark.sources.snapshots import SnapshotCatalog
        from parsel_spark.sources.synth import (
            SynthConfig,
            synth_pages,
            synth_robots,
        )

        cfg = SynthConfig(
            n_pages=300, n_hosts=20, out_degree=4, seed=3, with_images=False
        )
        pages = synth_pages(spark, cfg).cache()
        # per-host sitemaps listing a slice of real corpus urls
        urls = [r["url"] for r in pages.select("url").limit(40).collect()]
        xml = (
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(f"<url><loc>{u}</loc></url>" for u in urls)
            + "</urlset>"
        )
        sitemaps = spark.createDataFrame([(xml,)], "xml string")
        seeds = seeds_from_sitemaps(sitemaps)
        assert seeds.columns == ["url", "priority", "seq"]
        assert seeds.count() == len(set(urls))

        run = CrawlRun(
            spark,
            SnapshotCatalog(str(tmp_path / "cat")),
            pages,
            synth_robots(spark, cfg, fast=True),
            num_shards=8,
        )
        run.initialize(seeds)
        metrics = list(run.run(1))[0]
        pages.unpersist()
        assert metrics["dequeued"] > 0
        assert metrics["links_extracted"] > 0
