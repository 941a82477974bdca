"""DuckDB-SQL rendering of the pipeline spec (the driver's oracle side).

Renders plain ANSI-ish SQL strings that DuckDB can run over the same parquet
fixtures the Spark queries read, implementing *exactly* the semantics of
``ocrspark.pyref`` (differentially tested in tests/test_duckdb_oracle.py).

Portability notes (RE2 vs Java/Python regex) are centralized in config.py;
the only non-portable rule — de-stutter, needing a backreference — is outside
the oracle surface (fixtures use the ``portable`` corpus profile).

Duplicates in the subject-code fold are no-ops (merging a code equal to the
accumulator, or differing only at already-wildcarded positions, leaves the
accumulator unchanged), so the fold runs over raw in-order matches without
needing an order-preserving distinct.
"""

from __future__ import annotations

from . import config as C


def _q(pattern: str) -> str:
    """Quote a regex/string for a SQL literal.

    Config patterns carry literal control chars (portable across Python/Java
    regex); SQL literals can't — re-encode anything < 0x20 as an RE2
    ``\\x{..}`` escape.
    """
    out = []
    for ch in pattern.replace("'", "''"):
        out.append(f"\\x{{{ord(ch):x}}}" if ord(ch) < 0x20 else ch)
    return "'" + "".join(out) + "'"


def sql_recover(col: str) -> str:
    """Stage-1 recovery minus de-stutter (portable profile)."""
    return (
        f"regexp_replace(regexp_replace(coalesce({col}, ''), "
        f"{_q(C.CONTROL_CHARS_RE)}, '', 'g'), {_q(C.UNICODE_WS_RE)}, ' ', 'g')"
    )


def sql_squeeze(col: str) -> str:
    return f"trim(regexp_replace({col}, '\\s+', ' ', 'g'))"


def sql_strip_label(col: str) -> str:
    # non-global: first (start-anchored, hence only) match
    return f"regexp_replace({col}, {_q(C.LABEL_STRIP_RE)}, '')"


def sql_strip_admin(col: str) -> str:
    return sql_squeeze(f"regexp_replace({col}, {_q(C.ADMIN_STRIP_RE)}, ' ', 'g')")


def sql_normalize_math(col: str) -> str:
    c = sql_squeeze(col)
    for sym, rep in C.MATH_REPLACEMENTS:
        c = f"replace({c}, {_q(sym)}, {_q(rep)})"
    c = f"regexp_replace({c}, {_q(C.FRACTION_RE[0])}, '\\\\frac{{\\1}}{{\\2}}', 'g')"
    c = f"regexp_replace({c}, {_q(C.SUBSCRIPT_RE[0])}, '_{{\\1}}', 'g')"
    c = f"regexp_replace({c}, {_q(C.SUPERSCRIPT_RE[0])}, '^{{\\1}}', 'g')"
    c = f"regexp_replace({c}, {_q(C.OPERATOR_SPACE_RE[0])}, ' \\1 ', 'g')"
    return sql_squeeze(c)


def sql_points(col: str) -> str:
    return (
        f"CAST(coalesce(nullif(regexp_extract({col}, {_q(C.POINTS_RE)}, 1), ''), '0') AS INT)"
    )


def sql_subject(col: str) -> str:
    """P4: regex matches folded with one-position wildcarding (list_reduce)."""
    codes = f"regexp_extract_all({col}, {_q(C.SUBJECT_CODE_RE)}, 1)"
    diffs = (
        "list_filter(generate_series(1, length(acc)), "
        "i -> substr(acc,i,1) <> substr(c,i,1) AND substr(acc,i,1) NOT IN ('X','Y'))"
    )
    fold = f"""list_reduce({codes}, (acc, c) -> CASE
        WHEN length(c) <> length(acc) THEN acc
        WHEN length({diffs}) <> 1 THEN acc
        ELSE concat(
          substr(acc, 1, {diffs}[1] - 1),
          CASE WHEN regexp_matches(substr(acc, {diffs}[1], 1), '[0-9]')
               THEN 'Y' ELSE 'X' END,
          substr(acc, {diffs}[1] + 1))
      END)"""
    return f"coalesce(CASE WHEN length({codes}) > 0 THEN {fold} END, 'UNKNOWN')"


def sql_version(col: str) -> str:
    return f"""CASE
      WHEN regexp_extract({col}, {_q(C.SEASON_RE)}, 1) <> '' THEN
        upper(substr(regexp_extract({col}, {_q(C.SEASON_RE)}, 1), 1, 1))
        || right(regexp_extract({col}, {_q(C.SEASON_RE)}, 2), 2)
      WHEN regexp_extract({col}, {_q(C.EXERCISE_RE)}, 2) <> '' THEN
        'ØVING ' || regexp_extract({col}, {_q(C.EXERCISE_RE)}, 2)
      ELSE 'UNKNOWN'
    END"""


def sql_pipeline_ctes(docs_rel: str) -> str:
    """Shared CTE chain: docs relation -> `surviving` tasks + `kept` spans.

    ``docs_rel``: SQL relation with (doc_id, spans array<struct>).
    """
    marker = _q(C.MARKER_RE)
    return f"""
WITH flat AS (
  SELECT t.doc_id,
         u.s['offset'] AS off,
         u.s.kind AS kind,
         {sql_recover("u.s.text")} AS text,
         coalesce(u.s.media_ref, '') AS media_ref
  FROM {docs_rel} t, LATERAL UNNEST(t.spans) AS u(s)
),
cand AS (
  SELECT *,
    CASE WHEN kind = 'text'
          AND regexp_extract(text, {marker}, {C.MARKER_GROUP}) <> ''
          AND NOT regexp_matches(text, {_q(C.MAKS_POENG_ONLY_RE)})
      THEN CAST(regexp_extract(text, {marker}, {C.MARKER_GROUP}) AS INT)
    END AS cand_n
  FROM flat
),
mk AS (
  SELECT *,
    (cand_n IS NOT NULL AND cand_n = coalesce(max(cand_n) OVER w_prior, 0) + 1)
      AS is_marker
  FROM cand
  WINDOW w_prior AS (PARTITION BY doc_id ORDER BY off
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
seq AS (
  SELECT *, sum(CASE WHEN is_marker THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY off) AS task_seq
  FROM mk
),
sol AS (
  SELECT *, max(CASE WHEN kind = 'text'
        AND regexp_matches(text, {_q(C.SOLUTION_RE)}) THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id, task_seq ORDER BY off) AS in_sol
  FROM seq
),
kept AS (SELECT * FROM sol WHERE in_sol = 0),
tasks AS (
  SELECT doc_id, task_seq,
    sum(length(text)) AS raw_len,
    coalesce(string_agg(nullif(text, ''), ' ' ORDER BY off), '') AS task_text
  FROM kept GROUP BY doc_id, task_seq
),
tasks2 AS (
  SELECT *,
    length({sql_strip_admin(sql_strip_label("task_text"))}) AS stripped_len,
    {sql_points("task_text")} AS points
  FROM tasks
),
bounds AS (
  SELECT *,
    min(CASE WHEN task_seq >= 1 AND stripped_len >= {C.MIN_STRIPPED_TASK_CHARS}
         THEN task_seq END) OVER (PARTITION BY doc_id) AS first_valid,
    max(CASE WHEN task_seq >= 1 AND stripped_len >= {C.MIN_STRIPPED_TASK_CHARS}
         THEN task_seq END) OVER (PARTITION BY doc_id) AS last_valid
  FROM tasks2
),
numbered AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY task_seq)
                 AS VARCHAR) AS task_number
  FROM bounds
  WHERE task_seq BETWEEN first_valid AND last_valid
),
surviving AS (
  SELECT * FROM numbered WHERE raw_len >= {C.MIN_TASK_TEXT_CHARS}
),
docfields AS (
  SELECT doc_id,
    {sql_subject("doc_text")} AS subject,
    {sql_version("doc_text")} AS exam_version
  FROM (
    SELECT doc_id,
      coalesce(string_agg(nullif(text, ''), ' ' ORDER BY off), '') AS doc_text
    FROM kept GROUP BY doc_id
  )
)"""


def sql_extract_tasks(docs_rel: str) -> str:
    """Task-level extraction: one row per (doc_id, task_number)."""
    return f"""{sql_pipeline_ctes(docs_rel)}
SELECT s.doc_id, d.subject, d.exam_version, s.task_number, s.points
FROM surviving s JOIN docfields d USING (doc_id)
ORDER BY s.doc_id, CAST(s.task_number AS INT)"""


def sql_extract_spans(docs_rel: str) -> str:
    """Exploded output spans: full span-sequence equality surface."""
    return f"""{sql_pipeline_ctes(docs_rel)},
outspans AS (
  SELECT k.doc_id, s.task_number,
    CASE WHEN k.kind = 'image' THEN 0 ELSE 1 END AS img_key,
    k.off, k.kind, k.media_ref,
    {sql_normalize_math(sql_strip_admin("CASE WHEN k.is_marker THEN " + sql_strip_label("k.text") + " ELSE k.text END"))} AS text
  FROM kept k
  JOIN surviving s ON k.doc_id = s.doc_id AND k.task_seq = s.task_seq
),
filtered AS (
  SELECT * FROM outspans WHERE NOT (kind = 'text' AND text = '')
)
SELECT doc_id, task_number,
  CAST(row_number() OVER (PARTITION BY doc_id, task_number
                          ORDER BY img_key, off) - 1 AS INT) AS out_offset,
  kind, text, media_ref
FROM filtered
ORDER BY doc_id, CAST(task_number AS INT), out_offset"""
