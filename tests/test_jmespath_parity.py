"""JMESPath selection parity.

Scenarios derive from /root/reference/tests/test_selector_jmespath.py.
"""

from __future__ import annotations

import pytest

from parsel_spark import Selector


def test_json_has_html() -> None:
    # ref tests/test_selector_jmespath.py:12-46
    data = """
    {
        "content": [
            {"name": "A", "value": "a"},
            {"name": {"age": 18}, "value": "b"},
            {"name": "C", "value": "c"},
            {"name": "<a>D</a>", "value": "<div>d</div>"}
        ],
        "html": "<div><a>a<br>b</a>c</div><div><a>d</a>e<b>f</b></div>"
    }
    """
    sel = Selector(text=data)
    assert (
        sel.jmespath("html").get()
        == "<div><a>a<br>b</a>c</div><div><a>d</a>e<b>f</b></div>"
    )
    assert sel.jmespath("html").xpath("//div/a/text()").getall() == ["a", "b", "d"]
    assert sel.jmespath("html").css("div > b").getall() == ["<b>f</b>"]
    assert sel.jmespath("content").jmespath("name.age").get() == 18


HTML_WITH_JSON = """
<div>
    <h1>Information</h1>
    <content>
    {
      "user": [
                {"name": "A", "age": 18},
                {"name": "B", "age": 32},
                {"name": "C", "age": 22},
                {"name": "D", "age": 25}
      ],
      "total": 4,
      "status": "ok"
    }
    </content>
</div>
"""


def test_html_has_json() -> None:
    # ref tests/test_selector_jmespath.py:48-91
    sel = Selector(text=HTML_WITH_JSON)
    assert sel.xpath("//div/content/text()").jmespath("user[*].name").getall() == [
        "A", "B", "C", "D",
    ]
    assert sel.xpath("//div/content").jmespath("user[*].name").getall() == [
        "A", "B", "C", "D",
    ]
    assert sel.xpath("//div/content").jmespath("total").get() == 4


def test_jmespath_with_re() -> None:
    # ref tests/test_selector_jmespath.py:93-146
    sel = Selector(text=HTML_WITH_JSON)
    assert sel.xpath("//div/content/text()").jmespath("user[*].name").re(r"(\w+)") == [
        "A", "B", "C", "D",
    ]
    assert sel.xpath("//div/content").jmespath("user[*].name").re(r"(\w+)") == [
        "A", "B", "C", "D",
    ]
    with pytest.raises(TypeError):
        sel.xpath("//div/content").jmespath("user[*].age").re(r"(\d+)")
    assert sel.xpath("//div/content").jmespath("unavailable").re(r"(\d+)") == []
    assert sel.xpath("//div/content").jmespath("unavailable").re_first(r"(\d+)") is None
    assert sel.xpath("//div/content").jmespath("user[*].age.to_string(@)").re(
        r"(\d+)"
    ) == ["18", "32", "22", "25"]
