"""Main-text extraction (boilerplate removal): drop-tag rules, per-unit
link-density gating, recovering-parser integration, and distributed-UDF
parity with the local single-document form."""

from __future__ import annotations

from parsel_spark.functions.maintext import main_text_str


class TestMainTextRules:
    def test_boilerplate_tags_dropped(self) -> None:
        html = (
            "<html><head><title>T</title><script>var x=1;</script>"
            "<style>.a{}</style></head><body>"
            "<nav><a href='/'>home</a> <a href='/a'>about</a></nav>"
            "<header><a href='/l'>login</a></header>"
            "<h1>Title Here</h1>"
            "<p>Real article prose with several words in it.</p>"
            "<aside><a href='/x'>promo</a></aside>"
            "<footer>copyright corp</footer>"
            "</body></html>"
        )
        assert main_text_str(html) == (
            "Title Here Real article prose with several words in it."
        )

    def test_link_density_gates_per_unit(self) -> None:
        """A pure-link div is navigation (density 1.0, dropped); prose
        containing a minority link survives WITH the link text."""
        html = (
            "<body><div><a href='/p'>rel</a> <a href='/q'>links</a></div>"
            "<p>See <a href='/r'>this reference</a> for many more details"
            " about the topic.</p></body>"
        )
        assert main_text_str(html) == (
            "See this reference for many more details about the topic."
        )

    def test_exactly_half_link_density_kept(self) -> None:
        # 5 linked non-space chars / 10 total = 0.5 <= 0.5 → kept
        html = "<body><p><a href='/'>aaaaa</a> bbbbb</p></body>"
        assert main_text_str(html) == "aaaaa bbbbb"
        # 6/11 > 0.5 → dropped
        html2 = "<body><p><a href='/'>aaaaaa</a> bbbbb</p></body>"
        assert main_text_str(html2) == ""

    def test_whitespace_normalized(self) -> None:
        html = "<body><p>  spaced\n\tout   words </p><p>next</p></body>"
        assert main_text_str(html) == "spaced out words next"

    def test_nested_blocks_are_separate_units(self) -> None:
        """Block children split the parent's inline runs: the link-only
        run around a kept paragraph dies alone."""
        html = (
            "<body><div><a href='/1'>one</a> <a href='/2'>two</a>"
            "<p>kept paragraph text here</p>"
            "<a href='/3'>three</a></div></body>"
        )
        assert main_text_str(html) == "kept paragraph text here"

    def test_inline_markup_flattened(self) -> None:
        html = "<body><p>with <b>bold</b> and <i>italic</i> runs</p></body>"
        assert main_text_str(html) == "with bold and italic runs"

    def test_script_inside_paragraph_dropped(self) -> None:
        html = "<body><p>before <script>x()</script> after</p></body>"
        assert main_text_str(html) == "before after"

    def test_degenerate_inputs(self) -> None:
        assert main_text_str(None) == ""
        assert main_text_str("") == ""
        assert main_text_str("plain text only") == "plain text only"
        assert main_text_str("<script>only()</script>") == ""

    def test_recovering_parser_bad_markup(self) -> None:
        # unclosed tags + \x00 bytes must not raise (recover semantics)
        html = "<body><p>un\x00closed <b>bold<p>second para"
        got = main_text_str(html)
        assert "unclosed" in got and "second para" in got


class TestMainTextSpark:
    def test_udf_matches_local_on_corpus(self, spark) -> None:
        """Distributed main_text == local main_text_str on the planted
        doc-pages corpus (the local form IS the oracle)."""
        import __spark_entry__ as entrymod
        from parsel_spark.functions.maintext import main_text

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pages = entrymod._doc_pages(docs).limit(80)
        rows = pages.select(
            "doc_id", "html", main_text("html").alias("mt")
        ).collect()
        assert rows
        for r in rows:
            assert r["mt"] == main_text_str(r["html"]), r["doc_id"]

    def test_null_rows_yield_empty(self, spark) -> None:
        from parsel_spark.functions.maintext import main_text

        df = spark.createDataFrame(
            [(1, None), (2, "<body><p>ok text</p></body>")],
            "doc_id long, html string",
        )
        got = {
            r["doc_id"]: r["mt"]
            for r in df.select("doc_id", main_text("html").alias("mt")).collect()
        }
        assert got == {1: "", 2: "ok text"}
