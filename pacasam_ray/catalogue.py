"""Catalogue derivation: web pages → pacasam-style patch catalogue.

The reference's fundamental abstraction is one flat geospatial table of
"patches" with mandatory columns (geometry, patch_id, file_id, srid) plus
class-histogram counts and boolean descriptors
(reference: src/pacasam/connectors/connector.py:5-16,
src/pacasam/connectors/synthetic.py:14-30,71-88).

This engine derives the same catalogue columns on top of Common-Crawl-style
page rows (BASELINE.json input_hint): each page is deterministically
geocoded to a point on a patch grid (the analog of synthetic.py's 50 m
patches in 1 km slabs, src/pacasam/connectors/synthetic.py:27-30), assigned
a ``cell`` tile id at patch resolution and a ``file_id`` slab key at slab
resolution (the stratification key), boolean descriptors at the reference's
prevalences (configs/Synthetic.yml:14), class-histogram feature columns
(synthetic.py:77-79) and a nullable ``test`` flag at 20 %
(synthetic.py:31,84-88).

Everything is a pure function of the int64 row key (plus page content for
the content-derived descriptors), computed vectorized over Arrow batches
AND emitted as equivalent ANSI SQL — so the whole catalogue is
oracle-checkable in DuckDB and bit-identical at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hmix, hmix_sql

# Grid geometry (analog of synthetic.py:27-30 — 50 m patches in 1 km slabs).
PATCH_SIZE = 50.0  # patch edge, world units
PATCHES_PER_SLAB = 20  # slab edge = 20 patches = 1000 units
WORLD_SLABS = 25  # world edge in slabs
GRID = PATCHES_PER_SLAB * WORLD_SLABS  # 500 patches per world edge
SRID = 2154  # constant CRS id (reference: extractors/extractor.py:9)

# Salts for each derived quantity (documented, frozen).
SALT_GX = 1
SALT_GY = 2
SALT_C = {"c0": 10, "c1": 11, "c2": 12, "c3": 13}
SALT_TEST = 14
SALT_NB = 20  # nb feature j uses salt SALT_NB + j

# Boolean descriptor prevalences, per configs/Synthetic.yml:14 ([0.005,0.2,0.2,0.7]).
PREVALENCE_MILLE = {"c0": 5, "c1": 200, "c2": 200, "c3": 700}

# Class-histogram feature columns (names per synthetic.py:14-25, sans nb_total).
NB_COLS = [
    "nb_sol",
    "nb_bati",
    "nb_vegetation_basse",
    "nb_vegetation_moyenne",
    "nb_vegetation_haute",
    "nb_pont",
    "nb_eau",
    "nb_sursol_perenne",
    "nb_non_classes",
]
NB_MAX = 60_000  # uniform ints in [0, 60000) per synthetic.py:77-79

# Content-derived descriptor thresholds.
LONG_DOC_CHARS = 300

PATCH_INFO = ["patch_id", "file_id"]  # projection used by samplers (connector.py:16)


def derive_catalogue_arrays(ids: np.ndarray, n_chars: np.ndarray, lang: pa.Array) -> dict:
    """Vectorized catalogue derivation from int64 row keys + page content.

    Returns a dict of numpy/pyarrow arrays, all length len(ids).
    """
    ids = np.asarray(ids, dtype=np.int64)
    gx = hmix(ids, SALT_GX) % GRID
    gy = hmix(ids, SALT_GY) % GRID
    x = gx.astype(np.float64) * PATCH_SIZE + PATCH_SIZE / 2.0
    y = gy.astype(np.float64) * PATCH_SIZE + PATCH_SIZE / 2.0
    cell = gy * GRID + gx
    slab_x = gx // PATCHES_PER_SLAB
    slab_y = gy // PATCHES_PER_SLAB
    # file_id = "{sx}_{sy}" string slab key (stratification key).
    file_id = pa.compute.binary_join_element_wise(
        pa.compute.cast(pa.array(slab_x), pa.string()),
        pa.compute.cast(pa.array(slab_y), pa.string()),
        "_",
    )
    out = {
        "patch_id": ids,
        "x": x,
        "y": y,
        "cell": cell,
        "file_id": file_id,
        "xmin": gx.astype(np.float64) * PATCH_SIZE,
        "ymin": gy.astype(np.float64) * PATCH_SIZE,
        "xmax": (gx + 1).astype(np.float64) * PATCH_SIZE,
        "ymax": (gy + 1).astype(np.float64) * PATCH_SIZE,
        "srid": np.full(len(ids), SRID, dtype=np.int64),
    }
    for name, salt in SALT_C.items():
        out[name] = (hmix(ids, salt) % 1000) < PREVALENCE_MILLE[name]
    # Content-derived targetable booleans.
    n_chars = np.asarray(n_chars, dtype=np.int64)
    out["c_long"] = n_chars >= LONG_DOC_CHARS
    out["c_lang_en"] = pa.compute.equal(lang, "en")
    # Class-histogram features.
    total = np.zeros(len(ids), dtype=np.int64)
    for j, col in enumerate(NB_COLS):
        v = hmix(ids, SALT_NB + j) % NB_MAX
        out[col] = v
        total = total + v
    out["nb_total"] = total
    # Nullable test flag: 20 % true, rest null (null ⇒ train; synthetic.py:84-88).
    is_test = (hmix(ids, SALT_TEST) % 5) == 0
    out["test"] = pa.array(is_test, type=pa.bool_(), mask=~is_test)
    return out


def add_catalogue_columns(
    batch: pa.Table,
    id_col: str = "doc_id",
    n_chars_col: str = "n_chars",
    lang_col: str = "lang",
) -> pa.Table:
    """map_batches body (batch_format='pyarrow'): append all catalogue columns.

    ``n_chars`` is derived from ``text`` when absent (the F1 pages table has
    no n_chars column; documents.parquet carries it precomputed)."""
    if n_chars_col in batch.column_names:
        n_chars = batch[n_chars_col].to_numpy(zero_copy_only=False)
    else:
        n_chars = pa.compute.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
    derived = derive_catalogue_arrays(
        batch[id_col].to_numpy(zero_copy_only=False),
        n_chars,
        batch[lang_col].combine_chunks() if isinstance(batch[lang_col], pa.ChunkedArray) else batch[lang_col],
    )
    for name, arr in derived.items():
        if name == id_col or name in batch.column_names:
            continue
        batch = batch.append_column(name, pa.array(arr) if isinstance(arr, np.ndarray) else arr)
    return batch


def build_catalogue(ds, id_col: str = "doc_id", **map_kwargs):
    """Dataset → Dataset with catalogue columns appended (stateless, zero-copy)."""
    return ds.map_batches(
        add_catalogue_columns,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"id_col": id_col},
        **map_kwargs,
    )


# ---------------------------------------------------------------------------
# SQL mirror (DuckDB oracle). One source of truth for salts/constants above.
# ---------------------------------------------------------------------------

def catalogue_select_items(
    id_expr: str = "doc_id",
    n_chars_expr: str = "n_chars",
    lang_expr: str = "lang",
) -> dict:
    """Ordered {column: SQL expression} for every derived catalogue column."""
    gx = f"({hmix_sql(id_expr, SALT_GX)}) % {GRID}"
    gy = f"({hmix_sql(id_expr, SALT_GY)}) % {GRID}"
    items = {
        "patch_id": f"CAST({id_expr} AS BIGINT)",
        "x": f"({gx}) * {PATCH_SIZE!r} + {PATCH_SIZE / 2.0!r}",
        "y": f"({gy}) * {PATCH_SIZE!r} + {PATCH_SIZE / 2.0!r}",
        "cell": f"({gy}) * {GRID} + ({gx})",
        "file_id": (
            f"CAST(({gx}) // {PATCHES_PER_SLAB} AS VARCHAR) || '_' || "
            f"CAST(({gy}) // {PATCHES_PER_SLAB} AS VARCHAR)"
        ),
        "xmin": f"({gx}) * {PATCH_SIZE!r}",
        "ymin": f"({gy}) * {PATCH_SIZE!r}",
        "xmax": f"(({gx}) + 1) * {PATCH_SIZE!r}",
        "ymax": f"(({gy}) + 1) * {PATCH_SIZE!r}",
        "srid": f"CAST({SRID} AS BIGINT)",
    }
    for name, salt in SALT_C.items():
        items[name] = f"(({hmix_sql(id_expr, salt)}) % 1000) < {PREVALENCE_MILLE[name]}"
    items["c_long"] = f"{n_chars_expr} >= {LONG_DOC_CHARS}"
    items["c_lang_en"] = f"{lang_expr} = 'en'"
    nb_exprs = []
    for j, col in enumerate(NB_COLS):
        e = f"({hmix_sql(id_expr, SALT_NB + j)}) % {NB_MAX}"
        items[col] = e
        nb_exprs.append(f"({e})")
    items["nb_total"] = " + ".join(nb_exprs)
    items["test"] = (
        f"CASE WHEN ({hmix_sql(id_expr, SALT_TEST)}) % 5 = 0 THEN TRUE ELSE NULL END"
    )
    return items


def catalogue_sql(table: str = "documents", extra_cols: tuple = ()) -> str:
    """Full DuckDB SELECT deriving the catalogue from ``table`` (needs
    doc_id, n_chars, lang columns). ``extra_cols`` pass through verbatim."""
    items = catalogue_select_items()
    select = ", ".join([*(f"{c}" for c in extra_cols)] + [f"{e} AS {name}" for name, e in items.items()])
    return f"SELECT {select} FROM {table}"
