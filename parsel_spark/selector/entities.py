"""HTML character-entity replacement.

From-scratch equivalent of the entity policy the reference gets from
``w3lib.html.replace_entities`` (used at parsel/utils.py:94 with
``keep={lt, amp}``): named HTML entities, decimal and hex character
references are decoded; entities listed in ``keep`` are left untouched;
unrecognized entities are left as-is; codepoints in the 0x80-0x9f range
are remapped through cp1252 (the common "Windows smart quotes" fix-up).
"""

from __future__ import annotations

import re
from html.entities import name2codepoint

_ENTITY_RE = re.compile(
    r"&((?P<named>[a-zA-Z][a-zA-Z0-9]*)|#(?P<dec>\d+)|#[xX](?P<hex>[0-9a-fA-F]+));?",
)

HTML5_WHITESPACE = " \t\n\r\x0c"


def replace_entities(
    text: str,
    keep: tuple[str, ...] | list[str] = (),
    remove_illegal: bool = True,
    encoding: str = "utf-8",
) -> str:
    """Decode HTML entities in ``text`` except those named in ``keep``."""

    def convert(match: re.Match[str]) -> str:
        groups = match.groupdict()
        number: int | None = None
        if groups.get("dec"):
            number = int(groups["dec"])
        elif groups.get("hex"):
            number = int(groups["hex"], 16)
        elif groups.get("named"):
            name = groups["named"]
            if name in keep:
                return match.group(0)
            number = name2codepoint.get(name) or name2codepoint.get(name.lower())
        if number is not None:
            try:
                if 0x80 <= number <= 0x9F:
                    # undefined-in-unicode control block: cp1252 remap
                    return bytes((number,)).decode("cp1252")
                if number > 0x10FFFF or (0xD800 <= number <= 0xDFFF):
                    raise ValueError
                return chr(number)
            except ValueError:
                if remove_illegal:
                    return ""
                return match.group(0)
        return match.group(0)

    return _ENTITY_RE.sub(convert, text)
