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
