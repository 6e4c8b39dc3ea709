"""Text analysis operators for large-scale training-data pipelines.

All stages are stateless ``map_batches`` bodies over Arrow batches; the
language-ID stage is a callable class (actor pool) because it compiles its
n-gram profiles once per actor.

SQL-parity notes: token/punct/stopword counts are integer Arrow kernels
mirrored by LENGTH/REPLACE arithmetic in DuckDB, so the quality score —
a single IEEE-double expression over those integers — is bit-exact
oracle-checkable. Language-ID is heuristic (rows-only checks).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ["the", "a", "and", "of", "to"]
PUNCT = [".", ",", "!", "?", ";", ":"]


def _count_occurrences(text: pa.ChunkedArray | pa.Array, needle: str) -> pa.Array:
    """#occurrences = (len - len(replace(text, needle, ''))) / len(needle).
    Mirrors the DuckDB expression exactly (integer arithmetic)."""
    full = pc.cast(pc.utf8_length(text), pa.int64())
    removed = pc.cast(pc.utf8_length(pc.replace_substring(text, needle, "")), pa.int64())
    return pc.divide(pc.subtract(full, removed), len(needle))


def count_occurrences_sql(col: str, needle: str) -> str:
    e = needle.replace("'", "''")
    return f"(LENGTH({col}) - LENGTH(REPLACE({col}, '{e}', ''))) // {len(e)}"


def token_count(text) -> pa.Array:
    """Whitespace token count (0 for empty strings)."""
    full = pc.cast(pc.utf8_length(text), pa.int64())
    spaces = _count_occurrences(text, " ")
    n = pc.add(spaces, 1)
    return pc.if_else(pc.equal(full, 0), pa.scalar(0, pa.int64()), n)


def token_count_sql(col: str) -> str:
    return (
        f"CASE WHEN LENGTH({col}) = 0 THEN 0 "
        f"ELSE LENGTH({col}) - LENGTH(REPLACE({col}, ' ', '')) + 1 END"
    )


def quality_features(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Quality scoring: length, token count, punct ratio, stopword ratio,
    mean token length → one deterministic composite score in [0, ~1]."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False)
    n_tok = token_count(text).to_numpy(zero_copy_only=False)
    n_punct = np.zeros(len(n_chars), dtype=np.int64)
    for p in PUNCT:
        n_punct = n_punct + _count_occurrences(text, p).to_numpy(zero_copy_only=False)
    n_stop = np.zeros(len(n_chars), dtype=np.int64)
    lowered = pc.utf8_lower(text)
    padded = pc.binary_join_element_wise(
        pa.array([" "] * len(batch)), lowered, pa.array([" "] * len(batch)), ""
    )
    for w in STOPWORDS:
        n_stop = n_stop + _count_occurrences(padded, f" {w} ").to_numpy(zero_copy_only=False)

    tok_f = n_tok.astype(np.float64)
    denom = np.maximum(tok_f, 1.0)
    punct_ratio = n_punct.astype(np.float64) / denom
    stop_ratio = n_stop.astype(np.float64) / denom
    mean_tok_len = n_chars.astype(np.float64) / denom
    # composite: reward stopword presence + moderate token length, cap at 1
    quality = np.minimum(
        1.0, stop_ratio * 2.0 + np.minimum(mean_tok_len / 10.0, 0.5)
    )
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(n_tok),
        "n_punct": pa.array(n_punct),
        "n_stopwords": pa.array(n_stop),
        "punct_ratio": pa.array(punct_ratio),
        "stop_ratio": pa.array(stop_ratio),
        "mean_token_len": pa.array(mean_tok_len),
        "quality": pa.array(quality),
    })


def quality_features_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Bit-exact DuckDB twin of :func:`quality_features`."""
    n_chars = f"LENGTH({text_col})"
    n_tok = token_count_sql(text_col)
    n_punct = " + ".join(f"({count_occurrences_sql(text_col, p)})" for p in PUNCT)
    padded = f"' ' || LOWER({text_col}) || ' '"
    n_stop = " + ".join(
        f"({count_occurrences_sql(padded, ' ' + w + ' ')})" for w in STOPWORDS
    )
    return f"""
WITH f AS (
  SELECT {id_col}, CAST({n_chars} AS BIGINT) AS n_chars, CAST({n_tok} AS BIGINT) AS n_tokens,
         CAST({n_punct} AS BIGINT) AS n_punct, CAST({n_stop} AS BIGINT) AS n_stopwords
  FROM {table}
), r AS (
  SELECT *, GREATEST(CAST(n_tokens AS DOUBLE), CAST(1.0 AS DOUBLE)) AS denom FROM f
)
SELECT {id_col}, n_chars, n_tokens, n_punct, n_stopwords,
  CAST(n_punct AS DOUBLE) / denom AS punct_ratio,
  CAST(n_stopwords AS DOUBLE) / denom AS stop_ratio,
  CAST(n_chars AS DOUBLE) / denom AS mean_token_len,
  LEAST(CAST(1.0 AS DOUBLE), (CAST(n_stopwords AS DOUBLE) / denom) * 2.0
        + LEAST((CAST(n_chars AS DOUBLE) / denom) / 10.0, 0.5)) AS quality
FROM r
"""


def md5_fingerprint(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Content fingerprint: md5 hex of the utf-8 text bytes (DuckDB-parity).

    hashlib releases the GIL per call and the loop is IO-free; for very hot
    paths use the rolling winnowing fingerprint below instead."""
    arr = batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    fps = [hashlib.md5(v.encode()).hexdigest() for v in arr.to_pylist()]
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(fps, type=pa.string())})


def md5_fingerprint_sql(table: str = "documents") -> str:
    return f"SELECT doc_id, md5(text) AS fingerprint FROM {table}"


def winnowing_fingerprint(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprint: min rolling k-gram hash per window
    (Schleimer et al. 2003 scheme, standard plagiarism-detection sketch).
    Deterministic; used for near-dup candidate keys."""
    data = text.encode()
    if len(data) < k:
        return []
    B, M = 131, (1 << 31) - 1
    h = 0
    pw = pow(B, k - 1, M)
    hashes = []
    for i, ch in enumerate(data):
        h = (h * B + ch) % M
        if i >= k:
            h = (h - data[i - k] * pw * B) % M
        if i >= k - 1:
            hashes.append(h)
    fps = []
    last = -1
    for i in range(len(hashes) - window + 1):
        w = hashes[i : i + window]
        j = i + min(range(window), key=w.__getitem__)
        if j != last:
            fps.append(hashes[j])
            last = j
    return fps


# --- language id -----------------------------------------------------------

# tiny per-language profiles: characteristic high-frequency words/bigrams
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is", "in", "th", "he", "er"],
    "fr": ["le", "la", "et", "les", "des", "est", "en", "re", "ou"],
    "de": ["der", "die", "und", "ist", "das", "ein", "ch", "en", "ei"],
    "es": ["el", "la", "los", "las", "es", "de", "en", "ar", "os"],
    "zh": ["de", "shi", "le", "zai", "he", "wo", "zh", "ng", "sh"],
}


def lang_id_sql(table: str = "documents") -> str:
    """DuckDB twin of :class:`LangId` — the scoring is integer arithmetic
    over set intersections (2·|tokens ∩ profile| + |bigrams ∩ profile|) and
    the Python loop's strict `>` keeps the earlier lang of `sorted(langs)`
    on ties, i.e. ORDER BY score DESC, lang — so the heuristic IS
    SQL-expressible and the oracle is exact."""
    prof_rows = ", ".join(
        f"('{lang}', '{item}')"
        for lang, items in LANG_PROFILES.items() for item in items
    )
    lang_rows = ", ".join(f"('{lang}')" for lang in sorted(LANG_PROFILES))
    return f"""
WITH prof(lang, item) AS (VALUES {prof_rows}),
langs(lang) AS (VALUES {lang_rows}),
tok AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS item
        FROM {table}),
big AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS BIGINT), 2) AS item
        FROM {table}, LATERAL unnest(range(1, length(text))) AS t(i)),
tc AS (SELECT t.doc_id, p.lang, COUNT(*) AS c
       FROM tok t JOIN prof p ON t.item = p.item GROUP BY t.doc_id, p.lang),
bc AS (SELECT b.doc_id, p.lang, COUNT(*) AS c
       FROM big b JOIN prof p ON b.item = p.item GROUP BY b.doc_id, p.lang),
scored AS (
  SELECT d.doc_id, l.lang,
         COALESCE(tc.c, 0) * 2 + COALESCE(bc.c, 0) AS score
  FROM (SELECT doc_id FROM {table}) d
  CROSS JOIN langs l
  LEFT JOIN tc ON tc.doc_id = d.doc_id AND tc.lang = l.lang
  LEFT JOIN bc ON bc.doc_id = d.doc_id AND bc.lang = l.lang
)
SELECT doc_id, lang AS lang_pred
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) = 1
"""


class LangId:
    """Actor-pool stage: n-gram/stopword profile scoring, profiles compiled
    once per actor in ``__init__`` (the canonical stateful-stage shape)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.profiles = {
            lang: set(words) for lang, words in LANG_PROFILES.items()
        }
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        preds = []
        for t in texts:
            toks = set(t.lower().split())
            bigrams = {t[i : i + 2] for i in range(len(t) - 1)}
            best, best_score = self.langs[0], -1.0
            for lang in self.langs:
                prof = self.profiles[lang]
                score = len(toks & prof) * 2 + len(bigrams & prof)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


# --- PII-style scrubbing ----------------------------------------------------

# (pattern, replacement) pairs applied IN ORDER. Patterns deliberately use
# only syntax with identical semantics in Python `re` and DuckDB's RE2
# (character classes, +, alternation — no lookaround, no backrefs), so the
# DuckDB regexp_replace(..., 'g') oracle is bit-exact.
SCRUB_RULES = [
    (r"[A-Za-z0-9_.]+@[A-Za-z0-9_.]+", "<EMAIL>"),
    (r"[0-9][0-9 -]{6,}[0-9]", "<PHONE>"),
    (r"[0-9]+", "<NUM>"),
]


class TextScrubber:
    """Actor-pool stage: regexes compiled once per actor in ``__init__``
    (the stateful-stage shape); each batch is scrubbed with the compiled
    rules applied in order. The fetch-heavy analog of this stage in the
    reference is per-patch WMS colorization; here the per-row transform is
    redaction of email/phone/number spans — the standard pre-training text
    hygiene pass."""

    def __init__(self, text_col: str = "text", out_col: str = "text_scrubbed"):
        import re

        self.rules = [(re.compile(p), r) for p, r in SCRUB_RULES]
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = []
        for t in texts:
            for rx, repl in self.rules:
                t = rx.sub(repl, t)
            out.append(t)
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


def text_scrub_sql(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    expr = text_col
    for pat, repl in SCRUB_RULES:
        sq = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sq}', '{repl}', 'g')"
    return f"SELECT {id_col}, {expr} AS text_scrubbed FROM {table}"


# --- repetition ratio (Gopher-style quality rule) ---------------------------

def repetition_ratio(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-doc duplicate-2-gram fraction: 1 − distinct/total word-2-grams —
    the Gopher/C4-style repetition filter signal. Inherently per-document
    (set construction over that doc's grams); the division mirrors the SQL
    twin's two IEEE ops exactly."""
    ids = batch[id_col]
    out = []
    for txt in batch[text_col].to_pylist():
        w = txt.split(" ")
        total = len(w) - 1
        if total <= 0:
            out.append(0.0)
            continue
        distinct = len({(w[i], w[i + 1]) for i in range(total)})
        out.append(1.0 - float(distinct) / float(total))
    return pa.table({id_col: ids, "rep_ratio": pa.array(out, pa.float64())})


def repetition_ratio_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}),
t AS (SELECT {id_col}, len(w) - 1 AS total FROM toks),
g AS (SELECT DISTINCT {id_col}, w[i] || ' ' || w[i+1] AS g
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS u(i)),
d AS (SELECT {id_col}, COUNT(*) AS dist FROM g GROUP BY 1)
SELECT t.{id_col},
       CASE WHEN total <= 0 THEN 0.0
            ELSE 1.0 - CAST(COALESCE(dist, 0) AS DOUBLE) / CAST(total AS DOUBLE)
       END AS rep_ratio
FROM t LEFT JOIN d ON t.{id_col} = d.{id_col}
"""
