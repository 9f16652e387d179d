"""URL curation layer: RefinedWeb-style blocklist + word-score filter
and SURT sort keys (functions/urlfilter.py)."""

import pytest
from pyspark.sql import functions as F

from parsel_spark.functions.urlfilter import (
    host_suffixes,
    surt_key,
    url_filter_flags,
    url_word_score,
)


def _surt(spark, url):
    return (
        spark.range(1)
        .select(surt_key(F.lit(url)).alias("k"))
        .first()["k"]
    )


class TestSurtKey:
    def test_reverses_host_and_keeps_path_query(self, spark) -> None:
        assert (
            _surt(spark, "http://www.Example.com/A/b?q=1")
            == "com,example)/a/b?q=1"
        )

    def test_bare_host_normalizes_to_root_path(self, spark) -> None:
        assert _surt(spark, "https://sub.site.org") == "org,site,sub)/"

    def test_port_userinfo_fragment_dropped(self, spark) -> None:
        assert (
            _surt(spark, "http://u:p@host.test:8080/x#frag") == "test,host)/x"
        )

    def test_www_strip_is_optional(self, spark) -> None:
        got = (
            spark.range(1)
            .select(
                surt_key(F.lit("http://www.a.test/"), strip_www=False).alias("k")
            )
            .first()["k"]
        )
        assert got == "test,a,www)/"

    def test_subdomains_sort_adjacent_to_site(self, spark) -> None:
        urls = [
            "http://example.com/z",
            "http://a.example.com/p",
            "http://examplez.com/a",
        ]
        keys = sorted(_surt(spark, u) for u in urls)
        # both example.com pages precede examplez.com
        assert keys == [
            "com,example)/z",
            "com,example,a)/p",
            "com,examplez)/a",
        ]


class TestHostSuffixes:
    def test_shapes(self, spark) -> None:
        rows = spark.createDataFrame(
            [("a.b.c.d",), ("x.y",), ("localhost",)], "h string"
        ).select(host_suffixes(F.col("h")).alias("s")).collect()
        got = {tuple(r["s"]) for r in rows}
        assert ("c.d", "b.c.d", "a.b.c.d") in got
        assert ("x.y",) in got
        assert ("localhost",) in got

    def test_deep_host_caps_at_max_labels(self, spark) -> None:
        row = (
            spark.createDataFrame([("a.b.c.d.e.f.g",)], "h string")
            .select(host_suffixes(F.col("h"), max_labels=5).alias("s"))
            .first()
        )
        assert row["s"] == ["f.g", "e.f.g", "d.e.f.g", "c.d.e.f.g"]


class TestUrlWordScore:
    def test_weights_sum_once_per_word(self, spark) -> None:
        got = (
            spark.createDataFrame(
                [("http://a.test/casino/casino?x=poker",)], "url string"
            )
            .select(
                url_word_score("url", {"casino": 3, "poker": 2, "webcam": 9}).alias(
                    "s"
                )
            )
            .first()["s"]
        )
        assert got == 5  # casino counted once despite two occurrences

    def test_rejects_bad_word_tables(self) -> None:
        with pytest.raises(ValueError):
            url_word_score("url", {})
        with pytest.raises(ValueError):
            url_word_score("url", {"Casino": 1})


class TestUrlFilterFlags:
    def _run(self, spark, urls, domains=("tracker.test",), threshold=3):
        urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
        block = spark.createDataFrame([(d,) for d in domains], "domain string")
        rows = url_filter_flags(
            urls_df, block, {"casino": 2, "poker": 2}, threshold
        ).collect()
        return {r["url"]: r for r in rows}

    def test_domain_and_subdomain_block(self, spark) -> None:
        got = self._run(
            spark,
            [
                "http://tracker.test/x",
                "http://ads.sub.tracker.test/y",
                "http://nottracker.test/z",
            ],
        )
        assert got["http://tracker.test/x"]["host_blocked"]
        assert got["http://ads.sub.tracker.test/y"]["host_blocked"]
        assert not got["http://nottracker.test/z"]["host_blocked"]
        assert got["http://nottracker.test/z"]["keep"]

    def test_word_threshold_boundary(self, spark) -> None:
        got = self._run(
            spark,
            ["http://ok.test/casino", "http://ok.test/casino-poker"],
        )
        assert got["http://ok.test/casino"]["word_score"] == 2
        assert got["http://ok.test/casino"]["keep"]  # 2 < 3
        assert got["http://ok.test/casino-poker"]["word_score"] == 4
        assert not got["http://ok.test/casino-poker"]["keep"]

    def test_scheme_gate(self, spark) -> None:
        got = self._run(spark, ["ftp://ok.test/a", "https://ok.test/a"])
        assert not got["ftp://ok.test/a"]["scheme_ok"]
        assert not got["ftp://ok.test/a"]["keep"]
        assert got["https://ok.test/a"]["keep"]

    def test_duplicate_blocklist_entries_do_not_fan_out(self, spark) -> None:
        urls_df = spark.createDataFrame(
            [("http://tracker.test/x",)], "url string"
        )
        block = spark.createDataFrame(
            [("tracker.test",), ("TRACKER.TEST",)], "domain string"
        )
        out = url_filter_flags(urls_df, block, {"casino": 1}, 9).collect()
        assert len(out) == 1 and out[0]["host_blocked"]

    def test_corpus_side_never_shuffles(self, spark) -> None:
        urls_df = spark.createDataFrame(
            [(f"http://h{i}.test/p",) for i in range(100)], "url string"
        )
        block = spark.createDataFrame([("tracker.test",)], "domain string")
        plan = (
            url_filter_flags(urls_df, block, {"casino": 1}, 9)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every suffix probe must be a broadcast hash join (the corpus
        # never exchanges); a shuffled join anywhere breaks the shape
        assert plan.count("BroadcastHashJoin") == 4, plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


class TestStripTrackingParams:
    def test_shapes(self, spark) -> None:
        """No-query passthrough; all-tracking drops the '?'; mixed
        keeps survivors in order; unknown-case keys are left alone."""
        from parsel_spark.functions.urlfilter import strip_tracking_params

        cases = {
            "http://a.test/p": "http://a.test/p",
            "http://a.test/p?utm_source=x": "http://a.test/p",
            "http://a.test/p?utm_campaign=c&id=5&fbclid=z&b=2":
                "http://a.test/p?id=5&b=2",
            "http://a.test/p?id=5&gclid=g": "http://a.test/p?id=5",
            "http://a.test/p?UTM_SOURCE=x": "http://a.test/p?UTM_SOURCE=x",
            "http://a.test/p?ref=x&mc_eid=m": "http://a.test/p?ref=x",
        }
        df = spark.createDataFrame([(u,) for u in cases], "url string")
        got = {r["url"]: r["c"] for r in
               df.select("url", strip_tracking_params("url").alias("c"))
               .collect()}
        assert got == cases


class TestRelCanonical:
    def test_extractor_first_wins_resolved_and_canonicalized(
        self, spark
    ) -> None:
        from pyspark.sql import functions as F

        from parsel_spark.functions.udfs import extract_rel_canonical

        rows = [
            # trap form: upper host + dot segments -> canonicalized
            ("http://a.test/p/1",
             '<html><head><link rel="canonical" '
             'href="HTTP://A.TEST/x/../real/1"></head><body>x</body></html>'),
            # first of two wins; multi-token rel matches
            ("http://a.test/p/2",
             '<html><head>'
             '<link rel="Canonical alternate" href="/first">'
             '<link rel="canonical" href="/second"></head></html>'),
            # relative href resolves against the page url
            ("http://a.test/dir/page", '<link rel="canonical" href="c">'),
            # no canonical -> NULL
            ("http://a.test/p/4", "<html><body>none</body></html>"),
            # stylesheet rel does NOT match
            ("http://a.test/p/5", '<link rel="stylesheet" href="/css">'),
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        got = {
            r["url"]: r["c"]
            for r in df.select(
                "url",
                extract_rel_canonical("html", "url").alias("c"),
            ).collect()
        }
        assert got["http://a.test/p/1"] == "http://a.test/real/1"
        assert got["http://a.test/p/2"] == "http://a.test/first"
        assert got["http://a.test/dir/page"] == "http://a.test/dir/c"
        assert got["http://a.test/p/4"] is None
        assert got["http://a.test/p/5"] is None

    def test_collapse_prefers_authoritative_capture(self, spark) -> None:
        from parsel_spark.functions.urlfilter import canonical_collapse

        pages = spark.createDataFrame(
            [
                ("http://a.test/real", None),            # the canonical itself
                ("http://a.test/real?utm=1", "http://a.test/real"),
                ("http://a.test/mirror", "http://a.test/real"),
                ("http://a.test/solo", None),
                # group with NO authoritative capture -> min url kept
                ("http://a.test/v2", "http://a.test/gone"),
                ("http://a.test/v1", "http://a.test/gone"),
            ],
            "url string, canonical string",
        )
        got = {
            r["canonical_url"]: (r["n_captures"], r["kept_url"])
            for r in canonical_collapse(pages).collect()
        }
        assert got["http://a.test/real"] == (3, "http://a.test/real")
        assert got["http://a.test/solo"] == (1, "http://a.test/solo")
        assert got["http://a.test/gone"] == (2, "http://a.test/v1")
