"""P8 / P10 — the reference's filesystem-safety predicates as pure
Catalyst boolean expressions over a path column (the "doc-id validation
regex" analog SURVEY §2 maps them to: in a table-backed engine these
gate INGEST MANIFESTS, not a live filesystem).

Reference semantics (citations into /root/reference/):

* P10 reserved-name rule: a user-created folder may not start with
  ``_`` nor contain ``/`` or ``\\``             — server/app.py:334-338
* P10 private/temp rejection: any path containing the private-space or
  API-temp prefix 404s, and ``_``-prefixed folders are pruned from
  every structure walk                 — server/src/utils/file.py:430-448,
                                         472-475 (defaults
                                         ``_files/_private_spaces``,
                                         ``_files/_tmp``, file.py:16-19)
* P8 temp-page filter: page images whose stem ends in ``$`` are
  compressed temporaries and are skipped — celery_app.py:113-118
  (``x[-5] != "$"`` — the char before the 4-char extension; rebuilt as
  the intent, "basename-without-extension ends with $", which agrees on
  every real page file and doesn't bake in a 3-letter-extension quirk)

One shared builder, two dialects (the functions/units.py pattern) so
the DuckDB twin cannot drift.  All predicates are scan-stage codegen —
zero shuffle, pushdown-friendly.
"""

from __future__ import annotations

PRIVATE_PATH = "_files/_private_spaces"
API_TEMP_PATH = "_files/_tmp"


def _fns(dialect: str) -> dict[str, str]:
    if dialect == "spark":
        return {"sw": "startswith", "ew": "endswith"}
    return {"sw": "starts_with", "ew": "ends_with"}


def reserved_name_sql(name: str, dialect: str = "spark") -> str:
    """app.py:334-338: starts with '_' or contains a path separator."""
    f = _fns(dialect)
    return (
        f"({f['sw']}({name}, '_') or contains({name}, '/') "
        f"or contains({name}, chr(92)))"
    )


def private_or_temp_sql(path: str, dialect: str = "spark") -> str:
    """file.py:472-475: substring containment of either reserved prefix."""
    return (
        f"(contains({path}, '{PRIVATE_PATH}') "
        f"or contains({path}, '{API_TEMP_PATH}'))"
    )


def reserved_component_sql(path: str, dialect: str = "spark") -> str:
    """file.py:440-443: any '_'-prefixed component prunes the subtree."""
    if dialect == "spark":
        return (
            f"exists(split({path}, '/'), seg -> startswith(seg, '_'))"
        )
    return (
        f"(len(list_filter(string_split({path}, '/'), "
        f"seg -> starts_with(seg, '_'))) > 0)"
    )


def temp_page_sql(filename: str, dialect: str = "spark") -> str:
    """celery_app.py:113-118: stem (basename minus extension) ends '$'."""
    f = _fns(dialect)
    if dialect == "spark":
        base = f"element_at(split({filename}, '/'), -1)"
        pat = "'\\\\.[^.]*$'"
    else:
        base = f"string_split({filename}, '/')[-1]"
        pat = "'\\.[^.]*$'"
    return f"{f['ew']}(regexp_replace({base}, {pat}, ''), '$')"


def path_keep_sql(path: str, dialect: str = "spark") -> str:
    """The composed gate: a path survives every reference rejection."""
    return (
        f"(not {private_or_temp_sql(path, dialect)} "
        f"and not {reserved_component_sql(path, dialect)} "
        f"and not {temp_page_sql(path, dialect)})"
    )
