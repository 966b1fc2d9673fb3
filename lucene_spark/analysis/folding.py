"""ASCIIFoldingFilter + char-filter stage (HTMLStrip / Mapping).

Reference semantics (under /root/reference/lucene/analysis/common/):
- src/java/.../miscellaneous/ASCIIFoldingFilter.java:60-80 — fold
  Unicode characters to their ASCII equivalents where reasonable
  (accents stripped, ligatures expanded, Æ→AE, ß→ss, Þ→TH, …);
  characters with no mapping pass through unchanged. The reference's
  giant switch is re-derived here from Unicode NFKD decomposition plus
  an explicit table for the non-decomposable Latin letters — covers
  Latin-1 Supplement and Latin Extended-A completely (the ranges the
  reference tests exercise, TestASCIIFoldingFilter.java:48-135);
  scripts beyond Latin pass through (documented subset).
- src/java/.../charfilter/HTMLStripCharFilter.java — strip tags and
  decode entities before tokenization. Our subset is LENGTH-PRESERVING
  (tags → same-length spaces, entities → decoded char + pad spaces), so
  char offsets index the original text EXACTLY with no offset-
  correction map; the reference instead collapses lengths and corrects
  offsets. Post-tokenization output is identical for the standard
  grammar (tags and entity tails never glue word chars together).
- src/java/.../charfilter/MappingCharFilter.java — user-supplied
  char→string rewrites; same length-preserving convention (pad with
  spaces when the replacement is shorter; longer replacements are
  rejected, keeping offsets exact).
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

# Latin letters with no NFKD decomposition (ASCIIFoldingFilter.java's
# switch entries that pure mark-stripping cannot reach)
_FOLD_TABLE = {
    "Æ": "AE", "æ": "ae", "Ø": "O", "ø": "o", "Þ": "TH", "þ": "th",
    "Ð": "D", "ð": "d", "ß": "ss", "Đ": "D", "đ": "d", "Ħ": "H",
    "ħ": "h", "Ł": "L", "ł": "l", "Ŀ": "L", "ŀ": "l",
    "Ŋ": "NG", "ŋ": "ng", "Œ": "OE", "œ": "oe", "Ŧ": "T", "ŧ": "t",
    "ĸ": "q", "ı": "i", "Ƒ": "F", "ƒ": "f",
    # typographic quote/dash foldings (ASCIIFoldingFilter.java quote
    # and hyphen blocks)
    "ʼ": "'", "‘": "'", "’": "'", "‚": "'",
    "“": '"', "”": '"', "„": '"',
    "–": "-", "—": "-",
}

_fold_cache: dict[str, str] = {}


def _fold_char(ch: str) -> str:
    got = _fold_cache.get(ch)
    if got is not None:
        return got
    out = _FOLD_TABLE.get(ch)
    if out is None:
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(
            (c if ord(c) < 128 else _FOLD_TABLE.get(c, c))
            for c in decomp
            if not unicodedata.combining(c)
        )
        out = kept if kept and all(ord(c) < 128 for c in kept) else ch
    _fold_cache[ch] = out
    return out


def fold_ascii(s: str) -> str:
    """Fold ``s`` to ASCII equivalents; unmappable characters pass
    through unchanged (ASCIIFoldingFilter contract)."""
    if s.isascii():
        return s
    return "".join(ch if ord(ch) < 128 else _fold_char(ch) for ch in s)


# ---- char-filter stage (pre-tokenizer, length-preserving) -------------------

# quoted attribute values may contain '<'/'>' — consume them whole
_TAG_RE = re.compile(
    r"<!--.*?-->|<[!/]?[a-zA-Z](?:\"[^\"]*\"|'[^']*'|[^<>\"'])*>", re.DOTALL
)
_ENT_RE = re.compile(r"&#?[0-9a-zA-Z]{1,10};")


def _blank(m: re.Match) -> str:
    return " " * len(m.group())


def _decode_entity(m: re.Match) -> str:
    raw = m.group()
    dec = _html.unescape(raw)
    if dec != raw and len(dec) <= len(raw):
        return dec + " " * (len(raw) - len(dec))
    return raw


def html_strip(text: str) -> str:
    """HTMLStrip-lite: tags/comments → same-length spaces, entities →
    decoded char + pad spaces. Length-preserving, so token offsets
    index the ORIGINAL markup exactly."""
    text = _TAG_RE.sub(_blank, text)
    return _ENT_RE.sub(_decode_entity, text)


def mapping_char_filter(mapping: dict[str, str]):
    """MappingCharFilter factory: greedy longest-match single-pass
    rewrites, length-preserving (short replacements pad with spaces;
    longer ones are rejected up front)."""
    for k, v in mapping.items():
        if not k:
            raise ValueError("empty-string mapping key")
        if len(v) > len(k):
            raise ValueError(
                f"mapping {k!r} -> {v!r} grows the text; offsets would shift"
            )
    if not mapping:
        return lambda text: text  # no-op, not an empty-alternation regex
    pat = re.compile("|".join(re.escape(k) for k in sorted(mapping, key=len, reverse=True)))

    def _apply(text: str) -> str:
        return pat.sub(lambda m: mapping[m.group()].ljust(len(m.group())), text)

    return _apply


_CHAR_FILTERS = {"html_strip": html_strip}


def char_filter_chain(names):
    """names → one text→text callable (None when empty). Unknown names
    raise immediately (driver side), not inside the UDF."""
    if not names:
        return None
    fns = []
    for n in names:
        if callable(n):
            fns.append(n)
        elif n in _CHAR_FILTERS:
            fns.append(_CHAR_FILTERS[n])
        else:
            raise ValueError(f"unknown char filter {n!r}")
    if len(fns) == 1:
        return fns[0]

    def _chain(text: str) -> str:
        for f in fns:
            text = f(text)
        return text

    return _chain
