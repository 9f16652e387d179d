"""HTML -> Markdown conversion (functions/markdown.py)."""

from __future__ import annotations

from parsel_spark.functions.markdown import to_markdown


class TestToMarkdown:
    def test_full_page_golden(self) -> None:
        html = (
            "<html><head><title>x</title><script>var a=1;</script></head>"
            "<body><h1>Main  Title</h1>"
            '<p>First <b>bold</b> and <a href="/x">a link</a> here.</p>'
            "<ul><li>one</li><li>two <em>soft</em></li></ul>"
            "<ol><li>first</li><li>second</li></ol>"
            "<pre>  raw   code\nlines</pre>"
            "<blockquote>quoted words</blockquote>"
            "<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr></table>"
            "loose trailing text</body></html>"
        )
        assert to_markdown(html) == (
            "# Main Title\n\n"
            "First **bold** and [a link](/x) here.\n\n"
            "- one\n- two *soft*\n\n"
            "1. first\n2. second\n\n"
            "```\n  raw   code\nlines\n```\n\n"
            "> quoted words\n\n"
            "| A | B |\n| --- | --- |\n| 1 | 2 |\n\n"
            "loose trailing text"
        )

    def test_nested_list_indents(self) -> None:
        html = "<ul><li>two<ol><li>n1</li><li>n2</li></ol></li></ul>"
        assert to_markdown(html) == "- two\n  1. n1\n  2. n2"

    def test_link_without_href_and_empty(self) -> None:
        assert to_markdown("<p><a>naked</a> text</p>") == "naked text"
        assert to_markdown("") == ""
        assert to_markdown(None) == ""
        assert to_markdown("<p>  </p>") == ""

    def test_drop_tags_and_br(self) -> None:
        out = to_markdown(
            "<p>before<br>after</p><style>.x{}</style>"
            "<noscript>enable js</noscript>"
        )
        assert "enable js" not in out and ".x" not in out
        assert out == "before after"  # br inside a paragraph normalizes

    def test_distributed_matches_local(self, spark) -> None:
        from parsel_spark.functions.markdown import html_to_markdown

        pages = [
            (i, f"<body><h2>T{i}</h2><p>body <i>em{i}</i></p></body>")
            for i in range(20)
        ]
        df = spark.createDataFrame(pages, "doc_id long, html string")
        got = {
            r["doc_id"]: r["md"]
            for r in df.select(
                "doc_id", html_to_markdown("html").alias("md")
            ).collect()
        }
        for i, html in pages:
            assert got[i] == to_markdown(html)
