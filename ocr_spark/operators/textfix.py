"""Encoding repair + Unicode normalization — the ftfy-lite pass every
web-crawl corpus runs before any tokenizer sees the bytes.

Crawled text arrives with three standard defects:

1. **Mojibake** — UTF-8 bytes that were decoded as cp1252/latin-1
   somewhere upstream ("café" shipped as "cafÃ©", curly quotes as
   "â€œ…â€\x9d"), sometimes twice (double-encoding).  The repair is the
   cp1252 → UTF-8 round-trip applied PIECEWISE (the UnicodeDammit
   convention): within each maximal cp1252-encodable run, byte spans
   that parse as valid multi-byte UTF-8 are decoded, every other byte
   falls back to its sloppy-cp1252 char — so "cafÃ© e\\u0301tude\\xa0"
   repairs the Ã© while the genuine combining mark and the NBSP pass
   through.  Self-guarding: genuine "café" encodes to ``b'caf\\xe9'``
   and a lone ``\\xe9`` is not valid UTF-8, so nothing changes; repairs
   fire only on the multi-byte-UTF-8-in-cp1252 signature.  Up to
   ``max_rounds`` rounds unwinds double-encoding.  cp1252 is decoded
   "sloppily" (the ftfy convention): the 5 unmapped bytes and raw C1
   controls keep their latin-1 identity so "â€\\x9d" (a latin-1-mangled
   RIGHT DOUBLE QUOTATION MARK) still unwinds.
2. **Decomposed Unicode** — NFD sequences ("e" + COMBINING ACUTE) that
   should compare equal to their NFC forms but don't; normalized to NFC
   (the ftfy default; NFKC is deliberately NOT applied — it is lossy on
   ligatures/superscripts and a corpus decision, not a repair).
3. **Junk characters** — C0/C1 control characters (except ``\\t \\n``)
   dropped, NBSP (U+00A0) mapped to a plain space.

Engine shape: one Arrow-batched ``mapInArrow`` kernel, no shuffle — the
same narrow-scan form as ``compression_ratio``.  The per-document Python
is a marker-scan fast path (ASCII-clean strings never pay the repair
attempt; ``str.encode``/``unicodedata.normalize`` are C-speed).  At
10^12 docs this fuses with the ingest scan.

Correctness gate: rows-only + pytest anchors and hypothesis properties
(no SQL engine exposes encoding transcoding), same class as the
multimodal/zlib kernels.  The pass is idempotent on its contract inputs
(text without C0/C1 controls or combining marks); outside the contract,
stripping a control or NFC-composing a mark can CREATE a new
mojibake-signature adjacency that a second pass would then repair
('Â\\x08€' → strip → 'Â€') — the same non-guarantee ftfy makes.

Reference tie-in: the reference trusts Tesseract's UTF-8 output and has
no transcoding pass; this is beyond-reference scope (training-data
pipeline tier, SURVEY.md §2 LLM-data table).
"""

from __future__ import annotations

import codecs
import unicodedata

from pyspark.sql import DataFrame

# cp1252 with the 5 undefined bytes (0x81 8D 8F 90 9D) falling back to
# their latin-1 identities — ftfy's "sloppy-windows-1252" convention.
_SLOPPY_DECODE = {
    b: bytes([b]).decode("cp1252", errors="ignore") or chr(b)
    for b in range(256)
}
# Encode map: inverse, preferring the cp1252 mapping for the 27 remapped
# C1 slots (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ) and —
# the other half of "sloppy" — letting raw C1 control chars (a latin-1
# decode upstream instead of cp1252) pass through byte-identically.
_SLOPPY_ENCODE = {ch: b for b, ch in _SLOPPY_DECODE.items()}
for _b in range(256):
    _SLOPPY_ENCODE.setdefault(chr(_b), _b)

# A repair attempt is only worth making when one of the telltale lead
# bytes of UTF-8-as-cp1252 is present (Ã Â â € sequences etc.): every
# 2-byte UTF-8 sequence decodes to a lead char in U+00C2-00DF, every
# 3-byte one to U+00E0-00EF.
_MOJIBAKE_LEADS = frozenset(chr(c) for c in range(0xC2, 0xF0))


def _mixed_utf8_decode(b: bytes) -> str:
    """Decode UTF-8 where it is valid, fall back to sloppy-cp1252 on the
    single invalid byte, continue — so 'cafÃ© \\xa0 naÃ¯ve' repairs the
    Ã© and Ã¯ sequences while the lone NBSP byte passes through.  Repairs
    fire only on byte runs that genuinely parse as multi-byte UTF-8 —
    which in cp1252-decoded text IS the mojibake signature."""
    out = []
    i, n = 0, len(b)
    while i < n:
        ch = b[i]
        if ch < 0x80:
            j = i + 1
            while j < n and b[j] < 0x80:
                j += 1
            out.append(b[i:j].decode("ascii"))
            i = j
            continue
        ln = (
            2
            if 0xC2 <= ch <= 0xDF
            else 3 if 0xE0 <= ch <= 0xEF else 4 if 0xF0 <= ch <= 0xF4 else 0
        )
        if ln and i + ln <= n:
            try:
                out.append(b[i : i + ln].decode("utf-8"))
                i += ln
                continue
            except UnicodeDecodeError:
                pass
        out.append(_SLOPPY_DECODE[ch])
        i += 1
    return "".join(out)


def _repair_once(s: str) -> str:
    """One repair round, piecewise: maximal sloppy-cp1252-encodable runs
    go through encode → mixed UTF-8 decode; chars outside the sloppy
    byte range (genuine non-latin text, combining marks) pass through
    untouched and bound the runs."""
    out: list[str] = []
    buf = bytearray()
    enc = _SLOPPY_ENCODE
    for ch in s:
        b = enc.get(ch)
        if b is None:
            if buf:
                out.append(_mixed_utf8_decode(bytes(buf)))
                buf.clear()
            out.append(ch)
        else:
            buf.append(b)
    if buf:
        out.append(_mixed_utf8_decode(bytes(buf)))
    return "".join(out)


def _repair_mojibake(s: str, max_rounds: int) -> tuple[str, int]:
    rounds = 0
    for _ in range(max_rounds):
        if not any(ch in _MOJIBAKE_LEADS for ch in s):
            break
        d = _repair_once(s)
        if d == s:
            break
        s = d
        rounds += 1
    return s, rounds


_JUNK = {c: None for c in range(0x20) if c not in (0x09, 0x0A)}
_JUNK.update({c: None for c in range(0x7F, 0xA0)})
_JUNK[0xA0] = " "  # NBSP


def fix_text(docs: DataFrame, max_rounds: int = 3) -> DataFrame:
    """``doc_id, text`` → ``doc_id, text_fixed, n_repairs, changed``:
    mojibake round-trip repair (up to ``max_rounds`` unwinds), NFC
    normalization, control-char strip, NBSP→space.  See module doc."""
    import pyarrow as pa

    ddl = "doc_id bigint, text_fixed string, n_repairs int, changed boolean"
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text_fixed", pa.string()),
            ("n_repairs", pa.int32()),
            ("changed", pa.bool_()),
        ]
    )

    def fn(it):
        for batch in it:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            fixed, nrep, chg = [], [], []
            for t in texts:
                s0 = t or ""
                s, r = (
                    _repair_mojibake(s0, max_rounds)
                    if not s0.isascii()
                    else (s0, 0)
                )
                if not s.isascii():
                    s = unicodedata.normalize("NFC", s)
                s = s.translate(_JUNK)
                fixed.append(s)
                nrep.append(r)
                chg.append(s != s0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(fixed, pa.string()),
                    pa.array(nrep, pa.int32()),
                    pa.array(chg, pa.bool_()),
                ],
                schema=schema,
            )

    return docs.select("doc_id", "text").mapInArrow(fn, ddl)
