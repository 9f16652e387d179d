"""Small helpers mirroring the reference's observable behavior
(parsel/utils.py: ``flatten``/``iflatten``, ``extract_regex``,
``shorten``), reimplemented from scratch on the stdlib."""

from __future__ import annotations

import re
from typing import Any, Iterable, Iterator

from .entities import replace_entities as _replace_entities


def _is_listlike(value: Any) -> bool:
    return hasattr(value, "__iter__") and not isinstance(value, (str, bytes))


def iflatten(sequence: Iterable[Any]) -> Iterator[Any]:
    """Lazily flatten arbitrarily nested iterables; strings/bytes atomic."""
    for item in sequence:
        if _is_listlike(item):
            yield from iflatten(item)
        else:
            yield item


def flatten(sequence: Iterable[Any]) -> list[Any]:
    """Flatten arbitrarily nested iterables into one list."""
    return list(iflatten(sequence))


def extract_regex(
    regex: str | re.Pattern[str], text: str, replace_entities: bool = True
) -> list[str]:
    """Extract strings from ``text`` following the reference policy
    (parsel/utils.py:68-94):

    * a named group ``extract`` wins: return its value from the first
      match (empty list when unmatched or the group did not participate);
    * otherwise ``findall`` — all groups, flattened, or whole matches for
      group-less patterns;
    * HTML entities are decoded in the results except ``&amp;``/``&lt;``.
    """
    if isinstance(regex, str):
        regex = re.compile(regex, re.UNICODE)

    if "extract" in regex.groupindex:
        match = regex.search(text)
        if match is None:
            strings: list[str] = []
        else:
            value = match.group("extract")
            strings = [value] if value is not None else []
    else:
        strings = regex.findall(text)

    strings = flatten(strings)
    if not replace_entities:
        return strings
    return [_replace_entities(s, keep=("lt", "amp")) for s in strings]


def shorten(text: str, width: int, suffix: str = "...") -> str:
    """Truncate ``text`` to ``width`` chars, appending ``suffix``."""
    if len(text) <= width:
        return text
    if width > len(suffix):
        return text[: width - len(suffix)] + suffix
    if width >= 0:
        return suffix[len(suffix) - width :]
    raise ValueError("width must be equal or greater than 0")
