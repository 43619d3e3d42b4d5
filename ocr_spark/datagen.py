"""Deterministic synthetic generator for the contract `documents` table.

Implements FIXTURES.md §1 exactly: seed 42, spans-per-doc lognormal(3.5, 1.0)
clipped to [1, 2000] plus a 0.1% mega-doc skew tail (50k–200k spans), kind mix
86% text / 6% media_ref / 4% boilerplate / 4% ocr_image in geometric runs
(p=0.3), ~3% of line-final words hyphen-terminated (dehyphenation workload,
reference server/src/utils/export.py:498-519), ~2% punctuation-decorated with
the strip set ``«»“”.,;:!?()[]{}"'`` (reference export.py:494), ~1%
empty/whitespace-only words (empty-word filter, reference
server/src/utils/parse_hocr.py:67-69), ~0.5% multi-word spans (the
line-as-one-word fallback, reference parse_hocr.py:61-64).

Output schema (contract + test sidecar):

    doc_id : string
    spans  : array<struct<kind string, text string, media_ref string,
                          offset int>>
    meta   : array<struct<page_no int, segment_pos int, para_pos int,
                          line_pos int, word_pos int, confidence int,
                          box array<double>>>    -- aligned with spans;
                                                 -- tests-only sidecar

`offset` is the true reading-order position (page → segment (top,left order)
→ paragraph → line → word; SURVEY.md §2.4).  ``scramble=True`` permutes each
document's spans+meta jointly (offset values kept) so tests can assert the
pipeline reconstructs reading order from either `offset` or the meta keys.

Generation is one vectorized numpy pass over the flat span stream — no
per-span Python.  Constraint baked in (see SURVEY.md §5 honesty note on the
reference's cross-paragraph merge corner, export.py:505 with line_index==0):
hyphens are only placed on line-final words whose successor word is a text
span in the *same page, segment and paragraph*, so the reference's
undefined-behavior path never triggers in fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
PUNCT_CHARS = "«»“”.,;:!?()[]{}\"'"

# deterministic pseudo-vocabulary: a Portuguese/English-shaped wordlist.
_EN = (
    "the court law case judge appeal decision document page text word order "
    "process justice right claim party state public record file image line "
    "section evidence rule act fact view term plan work time year day part"
).split()
_PT = (
    "tribunal acórdão processo juiz recurso decisão documento página texto "
    "palavra ordem justiça direito pedido parte estado público registo "
    "ficheiro imagem linha secção prova regra facto ato vista prazo obra "
    "tempo ano dia arte supremo relator sentença artigo código civil penal"
).split()
_SYL = ["ba", "co", "di", "fu", "ga", "le", "mi", "no", "pra", "qui", "ro",
        "sta", "tu", "ver", "xa", "zen", "lho", "ção", "men", "tor"]


def _vocab(size: int = 4096) -> np.ndarray:
    """Deterministic vocab: real PT/EN words first, then syllable compounds."""
    words = list(dict.fromkeys(_EN + _PT))
    rng = np.random.default_rng(SEED)
    while len(words) < size:
        k = rng.integers(2, 4)
        words.append("".join(_SYL[i] for i in rng.integers(0, len(_SYL), k)))
    return np.asarray(words[:size], dtype=object)


_KIND_NAMES = np.asarray(["text", "media_ref", "boilerplate", "ocr_image"],
                         dtype=object)
_KIND_PROBS = np.asarray([0.86, 0.06, 0.04, 0.04])

SPANS_PER_PAGE = 300          # page break cadence
WORDS_PER_LINE = 8
LINES_PER_PARA = 4


def generate(
    n_docs: int = 500,
    seed: int = SEED,
    scramble: bool = False,
    mega_frac: float = 0.001,
    id_offset: int = 0,
    n_mega: int | None = None,
) -> pa.Table:
    """Build the contract table (+ meta sidecar) as one Arrow table.
    ``id_offset`` shifts the doc-id range so chunked parallel generation
    (generate_to_path ``processes``) yields globally unique ids;
    ``n_mega`` overrides the per-call mega-doc count so the PARALLEL
    path can apportion the GLOBAL tail across chunks — per-chunk
    rounding of ``mega_frac`` would delete the skew tail entirely for
    small chunks (round(417·0.001)=0 in every chunk) or inflate it for
    chunks just past .5."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    v = len(vocab)

    # --- spans per document: lognormal body + mega tail -------------------
    n_spans = np.clip(
        rng.lognormal(3.5, 1.0, n_docs).astype(np.int64), 1, 2000
    )
    if n_mega is None:
        n_mega = int(round(n_docs * mega_frac))
    if n_mega > 0:
        mega_idx = rng.choice(n_docs, n_mega, replace=False)
        n_spans[mega_idx] = rng.integers(50_000, 200_001, n_mega)

    total = int(n_spans.sum())
    doc_ix = np.repeat(np.arange(n_docs), n_spans)          # doc of each span
    starts = np.concatenate(([0], np.cumsum(n_spans)))[:-1]
    j = np.arange(total) - starts[doc_ix]                    # within-doc index

    # --- kind runs (geometric, p=0.3), new run forced at doc/page edges ---
    new_run = (j == 0) | (j % SPANS_PER_PAGE == 0) | (rng.random(total) < 0.3)
    run_id = np.cumsum(new_run) - 1
    n_runs = run_id[-1] + 1 if total else 0
    run_kind = rng.choice(4, n_runs, p=_KIND_PROBS)
    kind = run_kind[run_id]                                  # 0..3 per span

    # --- reading-order structure ------------------------------------------
    page_no = (j // SPANS_PER_PAGE).astype(np.int32) + 1
    # segment = dense run index within page
    page_start_flag = (j % SPANS_PER_PAGE == 0) | (j == 0)
    # run index at each span's page start: forward-fill run_id over page starts
    page_first_run = np.maximum.accumulate(np.where(page_start_flag, run_id, -1))
    segment_pos = (run_id - page_first_run).astype(np.int32)

    # within-run word index (for para/line/word structure of text-ish runs)
    run_start_flag = new_run
    run_start_pos = np.maximum.accumulate(
        np.where(run_start_flag, np.arange(total), -1)
    )
    k = np.arange(total) - run_start_pos                     # index within run

    textish = (kind == 0) | (kind == 3)                      # text | ocr_image
    per_para = WORDS_PER_LINE * LINES_PER_PARA
    para_pos = np.where(textish, k // per_para, -1).astype(np.int32)
    line_pos = np.where(textish, (k % per_para) // WORDS_PER_LINE, -1).astype(np.int32)
    word_pos = np.where(textish, k % WORDS_PER_LINE, -1).astype(np.int32)

    # --- text payloads ------------------------------------------------------
    word_idx = np.minimum((rng.random(total) ** 2.2 * v).astype(np.int64), v - 1)
    words = vocab[word_idx].copy()

    # decoration classes on text-ish spans
    u = rng.random(total)
    is_empty = textish & (u < 0.01)
    is_multi = textish & (u >= 0.01) & (u < 0.015)
    is_punct = textish & (u >= 0.015) & (u < 0.035)
    # hyphen eligibility: line-final TEXT word whose immediate successor is a
    # text span in the same doc/page/segment/paragraph (never page- or
    # paragraph-final → the reference's well-defined merge path only)
    nxt_same_doc = np.zeros(total, dtype=bool)
    nxt_same_doc[:-1] = doc_ix[1:] == doc_ix[:-1]
    nxt_text = np.zeros(total, dtype=bool)
    nxt_text[:-1] = kind[1:] == 0
    nxt_same_ctx = np.zeros(total, dtype=bool)
    nxt_same_ctx[:-1] = (
        (page_no[1:] == page_no[:-1])
        & (segment_pos[1:] == segment_pos[:-1])
        & (para_pos[1:] == para_pos[:-1])
    )
    hyph_ok = (
        (kind == 0)
        & (word_pos == WORDS_PER_LINE - 1)
        & nxt_same_doc & nxt_text & nxt_same_ctx
    )
    is_hyph = hyph_ok & (u >= 0.035) & (u < 0.065) & ~is_empty & ~is_multi & ~is_punct

    w2 = vocab[np.minimum((rng.random(total) ** 2.2 * v).astype(np.int64), v - 1)]
    dec = words.copy()
    if is_multi.any():
        dec[is_multi] = np.char.add(
            np.char.add(words[is_multi].astype(str), " "), w2[is_multi].astype(str)
        ).astype(object)
    if is_punct.any():
        style = rng.integers(0, 3, int(is_punct.sum()))
        base = words[is_punct].astype(str)
        out = np.where(
            style == 0,
            np.char.add(np.char.add("«", base), "»."),
            np.where(
                style == 1,
                np.char.add(np.char.add("“", base), "”,"),
                np.char.add(np.char.add("(", base), ")!"),
            ),
        )
        dec[is_punct] = out.astype(object)
    if is_hyph.any():
        dec[is_hyph] = np.char.add(words[is_hyph].astype(str), "-").astype(object)
    if is_empty.any():
        empt = rng.integers(0, 2, int(is_empty.sum()))
        dec[is_empty] = np.where(empt == 0, "", "  ").astype(object)

    # per-kind payload columns
    text = np.where(textish, dec, None)
    media = np.where(
        kind == 1,
        np.char.add(
            np.char.add(
                np.char.add("page", page_no.astype(str)), "_"
            ),
            np.char.add(segment_pos.astype(str), ".png"),
        ).astype(object),
        None,
    )

    confidence = np.where(
        textish, (rng.beta(9.0, 1.0, total) * 100).astype(np.int32), -1
    ).astype(np.int32)

    left = (word_pos.clip(min=0) * 120).astype(np.float64)
    top = (line_pos.clip(min=0) * 40 + para_pos.clip(min=0) * 200
           + segment_pos * 900).astype(np.float64)
    box = np.stack([left, top, left + 110.0, top + 32.0], axis=1)

    offset = j.astype(np.int32)

    # --- optional deterministic scramble (joint permutation per doc) -------
    order = np.arange(total)
    if scramble:
        perm = rng.random(total)
        # sort by (doc, random) → permutes within each doc only
        order = np.lexsort((perm, doc_ix))

    kind_names = _KIND_NAMES[kind][order]
    spans_struct = pa.StructArray.from_arrays(
        [
            pa.array(kind_names, type=pa.string()),
            pa.array(text[order], type=pa.string()),
            pa.array(media[order], type=pa.string()),
            pa.array(offset[order], type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    meta_struct = pa.StructArray.from_arrays(
        [
            pa.array(page_no[order], type=pa.int32()),
            pa.array(segment_pos[order], type=pa.int32()),
            pa.array(para_pos[order], type=pa.int32()),
            pa.array(line_pos[order], type=pa.int32()),
            pa.array(word_pos[order], type=pa.int32()),
            pa.array(confidence[order], type=pa.int32()),
            pa.ListArray.from_arrays(
                pa.array(np.arange(0, 4 * total + 1, 4), type=pa.int32()),
                pa.array(box[order].ravel(), type=pa.float64()),
            ),
        ],
        names=["page_no", "segment_pos", "para_pos", "line_pos", "word_pos",
               "confidence", "box"],
    )
    list_offsets = pa.array(np.concatenate(([0], np.cumsum(n_spans))), type=pa.int32())
    spans_col = pa.ListArray.from_arrays(list_offsets, spans_struct)
    meta_col = pa.ListArray.from_arrays(list_offsets, meta_struct)
    doc_ids = pa.array(
        [f"doc-{i:08d}" for i in range(id_offset, id_offset + n_docs)],
        type=pa.string(),
    )

    return pa.table({"doc_id": doc_ids, "spans": spans_col, "meta": meta_col})


def write_parquet(
    table: pa.Table, path: str, row_group_docs: int = 256, n_files: int = 1
) -> None:
    """Write with small row groups so a mega-doc never dominates one row
    group.  ``n_files > 1`` writes a directory of part files — the layout a
    real distributed table has, and what lets Spark's scan parallelize
    (FileSourceScan splits at file/maxPartitionBytes granularity; one fat
    file caps the whole job at a couple of tasks)."""
    import os

    if n_files <= 1:
        pq.write_table(table, path, row_group_size=row_group_docs)
        return
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(
                chunk,
                os.path.join(path, f"part-{i:05d}.parquet"),
                row_group_size=row_group_docs,
            )


def _generate_chunk(args: tuple) -> None:
    """Worker for parallel generation: build one id-offset chunk and
    write its part files straight into the shared temp dir (chunk index
    namespaces the file names, so writers never collide)."""
    tmp, n_docs, seed, scramble, chunk_ix, id_offset, files, n_mega = args
    import os

    table = generate(
        n_docs=n_docs, seed=seed, scramble=scramble, id_offset=id_offset,
        n_mega=n_mega,
    )
    step = (n_docs + files - 1) // files
    for j in range(files):
        part = table.slice(j * step, step)
        if part.num_rows:
            pq.write_table(
                part,
                os.path.join(tmp, f"part-{chunk_ix:03d}-{j:04d}.parquet"),
                row_group_size=256,
            )


def generate_to_path(
    path: str,
    n_docs: int = 500,
    seed: int = SEED,
    scramble: bool = False,
    n_files: int = 1,
    processes: int | None = None,
) -> str:
    """Generate and write atomically: callers cache generated tables by
    ``os.path.exists(path)`` (bench/driver fixtures in /tmp persist
    across runs), so a crash mid-write must not leave a half-written
    table that poisons every later run — write to a sibling temp name,
    then rename (atomic on POSIX for both files and directories).

    ``processes > 1`` generates in parallel chunks (each worker a
    disjoint doc-id range with its own derived seed) — single-threaded
    generation is only ~400 docs/s (the string-array ops dominate),
    which makes multi-hundred-k soak tables impractically slow to
    build; 8 workers measure ~3k docs/s.  Chunked output is deterministic for a
    fixed (seed, n_docs, processes) but NOT byte-identical to the
    single-process layout of the same seed — keep ``processes=None``
    for the contract fixtures whose content tests pin."""
    import os
    import shutil

    tmp = f"{path}.tmp-{os.getpid()}"
    try:
        if processes and processes > 1:
            import multiprocessing as mp

            os.makedirs(tmp, exist_ok=True)
            n_chunks = min(processes, max(1, n_docs))
            step = (n_docs + n_chunks - 1) // n_chunks
            files_per_chunk = max(1, (n_files + n_chunks - 1) // n_chunks)
            # the mega-doc skew tail is apportioned GLOBALLY: chunk c
            # gets its fair integer share of round(n_docs·0.001), never
            # a per-chunk rounding of its own fraction
            total_mega = int(round(n_docs * 0.001))
            jobs = [
                (
                    tmp,
                    min(step, n_docs - c * step),
                    seed * 1_000_003 + c,
                    scramble,
                    c,
                    c * step,
                    files_per_chunk,
                    (total_mega * (c + 1)) // n_chunks
                    - (total_mega * c) // n_chunks,
                )
                for c in range(n_chunks)
                if c * step < n_docs
            ]
            if not jobs:  # n_docs == 0 — same contract as single-process
                write_parquet(generate(n_docs=0, seed=seed), tmp,
                              n_files=n_files)
            else:
                with mp.get_context("fork").Pool(len(jobs)) as pool:
                    pool.map(_generate_chunk, jobs)
        else:
            write_parquet(
                generate(n_docs=n_docs, seed=seed, scramble=scramble), tmp,
                n_files=n_files,
            )
        try:
            os.rename(tmp, path)
        except OSError:
            if not os.path.exists(path):
                raise
            # Destination exists and is a directory layout (rename over
            # a non-empty dir fails).  The contract is REPLACE — never
            # silently keep possibly-stale data generated with other
            # parameters: swap the old table out, the new one in, then
            # drop the old.  (Single-file destinations were replaced by
            # the plain rename above.)
            old = f"{path}.old-{os.getpid()}"
            os.rename(path, old)
            os.rename(tmp, path)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.unlink(old)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True) if os.path.isdir(tmp) \
                else os.unlink(tmp)
    return path
