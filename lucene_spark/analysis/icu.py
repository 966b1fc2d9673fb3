"""ICU normalization — the ICUNormalizer2Filter role.

Mirrors lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUNormalizer2Filter.java: a token filter that normalizes term text
with (by default) NFKC + Case Folding + removal of Default Ignorables
(ICU's "nfkc_cf"), or a standard normalization mode (nfc/nfd/nfkc/
nfkd). The public TestICUNormalizer2Filter goldens are pinned in
tests/test_icu.py: case folding ("Ruß"→"russ", "ΜΆΪΟΣ"/"Μάϊος"→
"μάϊοσ", supplementary 𐐖→𐐾), compatibility normalization (Arabic
presentation forms ﴳﴺﰧ→طمطمطم, fullwidth→ASCII), ignorable removal
(क्‍ष→क्ष), and the NFD alternate (é→e+◌́).

Implementation: Python's unicodedata (NFC/NFD/NFKC/NFKD) +
str.casefold (Unicode full case folding) + an explicit
Default_Ignorable_Code_Point range table (public UCD property,
DerivedCoreProperties.txt). nfkc_cf is realized as
NFKC → strip ignorables → casefold → NFKC (casefold output may
denormalize, e.g. compatibility singletons) — observably equal to
ICU's fused nfkc_cf on every pinned golden; exotic disagreements
(if any exist) would be a documented deviation, not silent drift,
since the analyzer is gate-checked through the bijection oracle."""

from __future__ import annotations

import unicodedata

# Default_Ignorable_Code_Point (UCD DerivedCoreProperties.txt, public):
# soft hyphen, combining grapheme joiner, Arabic letter mark, Hangul
# fillers, Khmer inherent vowels, Mongolian selectors/MVS, zero-width
# chars + directional marks, embedding/override controls, word joiner
# block + deprecated format chars, Hangul filler compat, variation
# selectors, ZWNBSP, halfwidth hangul filler, interlinear annotation
# + BOM-adjacent specials, Duployan format chars, musical beams/slurs,
# tag characters + variation selector supplement.
_IGNORABLE_RANGES = (
    (0x00AD, 0x00AD),
    (0x034F, 0x034F),
    (0x061C, 0x061C),
    (0x115F, 0x1160),
    (0x17B4, 0x17B5),
    (0x180B, 0x180F),
    (0x200B, 0x200F),
    (0x202A, 0x202E),
    (0x2060, 0x206F),
    (0x3164, 0x3164),
    (0xFE00, 0xFE0F),
    (0xFEFF, 0xFEFF),
    (0xFFA0, 0xFFA0),
    (0xFFF0, 0xFFF8),
    (0x1BCA0, 0x1BCA3),
    (0x1D173, 0x1D17A),
    (0xE0000, 0xE0FFF),
)


def _is_ignorable(ch: str) -> bool:
    o = ord(ch)
    for lo, hi in _IGNORABLE_RANGES:
        if lo <= o <= hi:
            return True
        if o < lo:
            return False
    return False


def icu_normalize(text: str, mode: str = "nfkc_cf") -> str:
    """Normalize one token's text (the CharTermAttribute rewrite of
    ICUNormalizer2Filter.incrementToken)."""
    if mode == "nfkc_cf":
        t = unicodedata.normalize("NFKC", text)
        if any(_is_ignorable(c) for c in t):
            t = "".join(c for c in t if not _is_ignorable(c))
        return unicodedata.normalize("NFKC", t.casefold())
    m = mode.upper()
    if m not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization mode: {mode!r}")
    return unicodedata.normalize(m, text)
