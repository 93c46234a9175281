"""Compressed posting segments + tree-structured merge.

Design (Lucene-shaped, Spark-native — see SURVEY.md §4.3/§7):

* A **segment** covers a contiguous docId range: ``seg_id = doc_id //
  seg_size``. This is the Spark analogue of Lucene's insertion-order
  segments (``/root/reference/java/alix/lucene/XMLIndexer.java:334-335``)
  and simultaneously the skew defense: a hot term ("the", "{") contributes
  at most ``seg_size`` postings to any (seg, term) group, so no reducer
  ever sees a full Zipf-head posting list. The (seg_id, term) shuffle IS
  the salted repartition-by-term of the north rule, with the salt chosen
  to be the doc range so that segments stay directly concatenable.
* Within a (segment, term): doc ids are delta-gap + varbyte encoded in
  blocks of ``BLOCK`` docs with per-block metadata (first/last doc,
  max_tf, min_dl). The block-max WAND impact bound is derived at query
  time as ``idf · tf_w(max_tf, min_dl, avgdl)`` — a valid upper bound
  because the BM25 tf-weight is increasing in tf and decreasing in dl.
  Storing (max_tf, min_dl) instead of a precomputed weight keeps the
  encoder free of any corpus-global statistic, which is what makes the
  single-pass build possible.
* **Norms**: one byte per doc per segment (Lucene's norm layout), the
  SmallFloat byte4 of the doc length.
* **Merge**: segments with disjoint, ordered doc ranges merge by decode +
  concat + re-encode per term — associative, so a tree of pairwise merge
  rounds (mirroring Lucene's background merges) yields bit-identical
  output to a direct build at the coarser segmentation. Property-tested
  in tests/test_segments_wand.py. No global stats are needed to merge.

Schema of the postings-segment table (one row per term-block):

    bucket: int        -- hash(term) % n_buckets: file-level pruning key
    seg_id: long       -- docId-range segment
    term:   string
    block_id: int
    n:      int        -- postings in this block (<= BLOCK)
    doc_gaps: binary   -- varbyte(delta(doc_ids))
    tfs:    binary     -- varbyte(tfs)
    first_doc, last_doc: long
    max_tf: int        -- query-time impact bound input
    min_dl: long       -- query-time impact bound input (quantized len)
    sum_tf: long       -- block tf total (forms table derives from this)
    positions: binary  -- varbyte(per-doc delta(positions)), tf values per
                          posting; b"" when built without positions

Positions (the reference's DOCS_AND_FREQS_AND_POSITIONS,
``/root/reference/java/alix/lucene/Alix.java:154-165``): each posting's
position list is delta-encoded *per document* (first position absolute,
then gaps), all lists of a block concatenated and varbyte'd together; the
block's ``tfs`` array gives the per-doc list lengths. Per-doc
self-containment means merged segments concatenate position streams
without re-encoding deltas.

Norms table: (seg_id, first_doc, n_docs, sum_dl, norm_bytes: binary).
``sum_dl`` lets query open compute corpus avgdl without a doc_lens scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from alix_spark.index import codec
from alix_spark.search.bm25 import B, K1

BLOCK = 128
DEFAULT_SEG_SIZE = 8192
DEFAULT_BUCKETS = 32

# reserved pseudo-term for norm rows in the single-pass unioned output;
# the tokenizers never emit an empty-string term into postings
NORM_MARKER = ""

SEGMENT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("seg_id", LongType()),
        StructField("term", StringType()),
        StructField("block_id", IntegerType()),
        StructField("n", IntegerType()),
        StructField("doc_gaps", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("first_doc", LongType()),
        StructField("last_doc", LongType()),
        StructField("max_tf", IntegerType()),
        StructField("min_dl", LongType()),
        StructField("sum_tf", LongType()),
        StructField("positions", BinaryType()),
    ]
)

NORMS_SCHEMA = StructType(
    [
        StructField("seg_id", LongType()),
        StructField("first_doc", LongType()),
        StructField("n_docs", IntegerType()),
        StructField("sum_dl", LongType()),
        StructField("norm_bytes", BinaryType()),
    ]
)


def tf_weight(tf, dl_q, avgdl: float):
    """Lucene-8 BM25 tf weight (no (k1+1) numerator) — works on numpy
    arrays or python floats."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl_q, dtype=np.float64)
    return tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def block_bound_w(max_tf, min_dl, avgdl: float) -> float:
    """Query-time per-block tf-weight upper bound."""
    return float(tf_weight(max_tf, min_dl, avgdl))


def _encode_term_blocks(
    term: str,
    bucket: int,
    seg_id: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dl_q: np.ndarray,
    pos_deltas: np.ndarray | None = None,
) -> list[tuple]:
    """One term's postings (sorted by doc) → block rows.

    ``pos_deltas``: occurrence-aligned per-doc delta-encoded positions
    (length == tfs.sum()); None builds a positions-free segment.
    """
    rows = []
    occ_bounds = None
    if pos_deltas is not None:
        occ_bounds = np.concatenate(
            ([0], np.cumsum(np.asarray(tfs, dtype=np.int64)))
        ).astype(np.int64)
    for b0 in range(0, doc_ids.size, BLOCK):
        d = doc_ids[b0 : b0 + BLOCK]
        t = tfs[b0 : b0 + BLOCK]
        dl = dl_q[b0 : b0 + BLOCK]
        if pos_deltas is None:
            pos_buf = b""
        else:
            lo, hi = occ_bounds[b0], occ_bounds[min(b0 + BLOCK, doc_ids.size)]
            pos_buf = codec.varbyte_encode(pos_deltas[lo:hi])
        rows.append(
            (
                bucket,
                seg_id,
                term,
                b0 // BLOCK,
                int(d.size),
                codec.varbyte_encode(codec.delta_encode(d)),
                codec.varbyte_encode(t),
                int(d[0]),
                int(d[-1]),
                int(t.max()),
                int(dl.min()),
                int(t.sum()),
                pos_buf,
            )
        )
    return rows


def build_segments(
    postings: DataFrame,
    doc_lens: DataFrame,
    seg_size: int = DEFAULT_SEG_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Two-stage path: uncompressed postings (term, doc_id, tf) →
    compressed segment rows. Grouped by (seg_id, bucket): group size ≈
    (postings in segment)/n_buckets — bounded for any term skew; per-group
    Spark/Arrow overhead amortized over ~vocab/n_buckets terms.
    """
    from alix_spark.search.bm25 import with_quantized_dl

    dlq = with_quantized_dl(doc_lens).withColumnRenamed("dl", "dl_q")
    p = (
        postings.select("term", "doc_id", "tf")
        .join(dlq, "doc_id")
        .withColumn("seg_id", (F.col("doc_id") / seg_size).cast("long"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
    )

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(pdf["seg_id"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        pdf = pdf.sort_values(["term", "doc_id"])
        rows = []
        terms = pdf["term"].to_numpy()
        docs = pdf["doc_id"].to_numpy(np.uint64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dlq_arr = pdf["dl_q"].to_numpy(np.int64)
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms)]))
        for s, e in zip(starts, ends):
            rows.extend(
                _encode_term_blocks(
                    terms[s], bucket, seg_id, docs[s:e], tfs[s:e], dlq_arr[s:e]
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return p.groupBy("seg_id", "bucket").applyInPandas(encode_group, SEGMENT_SCHEMA)


def build_norms(doc_lens: DataFrame, seg_size: int = DEFAULT_SEG_SIZE) -> DataFrame:
    """doc_lens → per-segment norm-byte arrays (1 byte/doc, Lucene
    layout). Docs with no tokens get norm byte 0."""

    def encode_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(pdf["seg_id"].iloc[0])
        first = seg_id * seg_size
        dls = pdf["dl"].to_numpy(np.int64)
        offs = (pdf["doc_id"].to_numpy(np.int64) - first).astype(np.int64)
        arr = np.zeros(int(offs.max()) + 1, dtype=np.uint8)
        arr[offs] = codec.int_to_byte4(dls)
        return pd.DataFrame(
            [(seg_id, first, int(arr.size), int(dls.sum()), arr.tobytes())],
            columns=[f.name for f in NORMS_SCHEMA.fields],
        )

    return (
        doc_lens.withColumn("seg_id", (F.col("doc_id") / seg_size).cast("long"))
        .groupBy("seg_id")
        .applyInPandas(encode_seg, NORMS_SCHEMA)
    )


def _encode_segment_tokens(
    seg_id: int,
    tok_pdf: pd.DataFrame,
    n_buckets: int,
    seg_size: int,
    term_bucket_fn,
) -> tuple[list[tuple], tuple]:
    """Shared kernel: one segment's (doc_id, term) rows → (block rows,
    norm row). Computes per-doc lengths locally (a doc lives in exactly
    one segment, so the group sees all its tokens).

    Pure numpy (factorize + lexsort + run-length) instead of pandas
    groupby: ~2× less memory traffic, which matters both for absolute
    throughput and for multi-core scaling (the kernel is bandwidth-bound
    before it is CPU-bound).
    """
    first = seg_id * seg_size
    codes, uniques = pd.factorize(tok_pdf["term"].to_numpy(), sort=True)
    docs_raw = tok_pdf["doc_id"].to_numpy(np.int64)
    has_pos = "pos" in tok_pdf.columns
    pos_raw = tok_pdf["pos"].to_numpy(np.int64) if has_pos else None

    # per-doc exact lengths -> norm bytes -> quantized lengths
    dl_counts = np.bincount(docs_raw - first)
    present = dl_counts > 0
    arr = np.zeros(dl_counts.size, dtype=np.uint8)
    arr[present] = codec.int_to_byte4(dl_counts[present])
    dl_all = codec.byte4_to_int(arr)
    norm_row = (
        seg_id,
        first,
        int(arr.size),
        int(dl_counts.sum()),
        arr.tobytes(),
    )

    # (term, doc) run-length counts over the lexsorted triples; positions
    # sort last so each run's occurrences come out position-ordered
    order = (
        np.lexsort((pos_raw, docs_raw, codes))
        if has_pos
        else np.lexsort((docs_raw, codes))
    )
    c = codes[order]
    d = docs_raw[order]
    if c.size == 0:
        return [], norm_row
    is_new = np.empty(c.size, dtype=bool)
    is_new[0] = True
    is_new[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    starts_rl = np.flatnonzero(is_new)
    tfs = np.diff(np.append(starts_rl, c.size)).astype(np.int64)
    gc = c[starts_rl]
    gd = d[starts_rl].astype(np.uint64)
    dl_q = dl_all[(gd.astype(np.int64) - first)]

    pos_deltas = None
    occ_bounds = None
    if has_pos:
        # per-run delta encoding: first position absolute, then gaps —
        # one vectorized diff with the run starts reset to absolutes
        p = pos_raw[order].astype(np.int64)
        deltas = np.empty_like(p)
        deltas[0] = p[0]
        deltas[1:] = p[1:] - p[:-1]
        deltas[starts_rl] = p[starts_rl]
        pos_deltas = deltas.astype(np.uint64)
        occ_bounds = np.concatenate(([0], np.cumsum(tfs)))

    change = np.flatnonzero(gc[1:] != gc[:-1]) + 1
    t_starts = np.concatenate(([0], change))
    t_ends = np.concatenate((change, [gc.size]))
    rows = []
    for s, e in zip(t_starts, t_ends):
        term = uniques[gc[s]]
        rows.extend(
            _encode_term_blocks(
                term,
                term_bucket_fn(term, n_buckets),
                seg_id,
                gd[s:e],
                tfs[s:e],
                dl_q[s:e],
                None
                if pos_deltas is None
                else pos_deltas[occ_bounds[s] : occ_bounds[e]],
            )
        )
    return rows, norm_row


def build_single_pass(
    tokens: DataFrame,
    seg_size: int = DEFAULT_SEG_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """ONE-shuffle index build: the token stream grouped by segment; each
    kernel computes tf + doc lengths + norms locally and emits block rows
    PLUS one norm marker row (term == NORM_MARKER, norm bytes in
    ``doc_gaps``, sum_dl in ``min_dl``, n_docs in ``n``).

    Split the output with :func:`split_single_pass`; derive the forms
    table with :func:`forms_from_segments`. No corpus-global statistic is
    read or written by the kernel — this is the maximally-scalable build
    (everything after the one shuffle is embarrassingly parallel).
    """
    from alix_spark.index.xxhash import term_bucket

    cols_in = ["doc_id", "term"] + (
        ["pos"] if "pos" in tokens.columns else []
    )
    t = tokens.select(*cols_in).withColumn(
        "seg_id", (F.col("doc_id") / seg_size).cast("long")
    )

    def encode_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        if pdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        seg_id = int(pdf["seg_id"].iloc[0])
        rows, norm = _encode_segment_tokens(
            seg_id, pdf, n_buckets, seg_size, term_bucket
        )
        seg_id_, first, n_docs, sum_dl, norm_bytes = norm
        rows.append(
            (
                -1,  # norm rows live in bucket -1 (own partition dir)
                seg_id_,
                NORM_MARKER,
                0,
                n_docs,
                norm_bytes,
                b"",
                first,
                first + n_docs - 1,
                0,
                sum_dl,
                0,
                b"",
            )
        )
        return pd.DataFrame(rows, columns=cols)

    return t.groupBy("seg_id").applyInPandas(encode_seg, SEGMENT_SCHEMA)


def build_single_pass_from_docs(
    docs: DataFrame,
    text_col: str = "content",
    seg_size: int = DEFAULT_SEG_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Single-pass build that shuffles RAW DOCUMENTS, not exploded tokens.

    The one exchange of :func:`build_single_pass` carries the token table
    — ~4× the corpus bytes (one ~25-byte row per occurrence). Here the
    groupBy(seg_id) shuffles ``(doc_id, text)`` instead — corpus-sized —
    and the kernel tokenizes inside the Arrow batch (C-speed regex per
    document, never per-row Python semantics: the whole batch is one
    pandas pass). Same output as ``build_single_pass`` over
    ``simple.tokenize`` (property-tested), with the shuffle shrunk to the
    theoretical minimum for a doc-range-partitioned index.

    Use this for the simple analysis chain; the French chain keeps the
    token-table path (its kernel already produced the tokens).
    """
    import re as _re

    from alix_spark.index.xxhash import term_bucket

    t = docs.select(
        F.col("doc_id"), F.col(text_col).alias("_text")
    ).withColumn("seg_id", (F.col("doc_id") / seg_size).cast("long"))
    tok_re = _re.compile(r"[a-z0-9]+")

    def encode_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        if pdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        seg_id = int(pdf["seg_id"].iloc[0])
        doc_arrs, term_arrs, pos_arrs = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
            toks = tok_re.findall((text or "").lower())
            if not toks:
                continue
            n = len(toks)
            doc_arrs.append(np.full(n, int(doc_id), dtype=np.int64))
            term_arrs.extend(toks)
            pos_arrs.append(np.arange(n, dtype=np.int64))
        if not doc_arrs:
            # keep the norm row so empty-doc segments stay represented
            first = seg_id * seg_size
            return pd.DataFrame(
                [(-1, seg_id, NORM_MARKER, 0, 0, b"", b"", first, first - 1,
                  0, 0, 0, b"")],
                columns=cols,
            )
        tok_pdf = pd.DataFrame(
            {
                "doc_id": np.concatenate(doc_arrs),
                "term": np.asarray(term_arrs, dtype=object),
                "pos": np.concatenate(pos_arrs),
            }
        )
        rows, norm = _encode_segment_tokens(
            seg_id, tok_pdf, n_buckets, seg_size, term_bucket
        )
        seg_id_, first, n_docs, sum_dl, norm_bytes = norm
        rows.append(
            (-1, seg_id_, NORM_MARKER, 0, n_docs, norm_bytes, b"", first,
             first + n_docs - 1, 0, sum_dl, 0, b"")
        )
        return pd.DataFrame(rows, columns=cols)

    return t.groupBy("seg_id").applyInPandas(encode_seg, SEGMENT_SCHEMA)


def split_single_pass(unioned: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Single-pass output → (segments, norms) with the standard schemas."""
    segments = unioned.filter(F.col("term") != NORM_MARKER)
    norms = unioned.filter(F.col("term") == NORM_MARKER).select(
        F.col("seg_id"),
        F.col("first_doc"),
        F.col("n").alias("n_docs"),
        F.col("min_dl").alias("sum_dl"),
        F.col("doc_gaps").alias("norm_bytes"),
    )
    return segments, norms


def corpus_stats_from_norms(norms: DataFrame) -> tuple[int, float]:
    """(n_docs_with_tokens, avgdl) from norm metadata — no corpus scan.

    Fully distributive: an Arrow-batched kernel reduces each norm row to
    two longs (nonzero-byte count = docs with tokens in the segment's
    doc-id range, and the stored sum_dl), then a global ``agg(sum)``
    brings exactly two numbers to the driver. No ``norm_bytes`` payload
    (seg_size bytes per row → O(n_docs) bytes total) ever leaves the
    executors, so the path is flat in corpus size.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def nonzero_bytes(b: pd.Series) -> pd.Series:
        return b.map(
            lambda x: int((np.frombuffer(x, dtype=np.uint8) != 0).sum())
        )

    row = (
        norms.select(
            nonzero_bytes(F.col("norm_bytes")).alias("n_nonzero"),
            F.col("sum_dl"),
        )
        .agg(
            F.coalesce(F.sum("n_nonzero"), F.lit(0)).alias("docs"),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("dl"),
        )
        .collect()[0]
    )
    total_docs, total_dl = int(row["docs"]), int(row["dl"])
    return total_docs, (total_dl / total_docs if total_docs else 0.0)


def forms_from_segments(segments: DataFrame) -> DataFrame:
    """Vocabulary stats straight from block metadata — no second pass
    over the corpus: occs = Σ sum_tf, docs = Σ n per term."""
    return segments.groupBy("term").agg(
        F.sum("sum_tf").cast("long").alias("occs"),
        F.sum("n").cast("long").alias("docs"),
    )


def build_segments_direct(
    tokens: DataFrame,
    norms: DataFrame,
    seg_size: int = DEFAULT_SEG_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Single-shuffle build against precomputed norms (kept for
    compatibility; `build_single_pass` subsumes it). Row-identical to
    the two-stage path (property-tested)."""
    from alix_spark.index.xxhash import term_bucket

    cols_in = ["doc_id", "term"] + (
        ["pos"] if "pos" in tokens.columns else []
    )
    t = tokens.select(*cols_in).withColumn(
        "seg_id", (F.col("doc_id") / seg_size).cast("long")
    )

    def encode_seg(key, tok_pdf: pd.DataFrame, norm_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        if tok_pdf.empty or norm_pdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        (seg_id,) = key
        rows, _ = _encode_segment_tokens(
            int(seg_id), tok_pdf, n_buckets, seg_size, term_bucket
        )
        return pd.DataFrame(rows, columns=cols)

    return (
        t.groupby("seg_id")
        .cogroup(norms.groupby("seg_id"))
        .applyInPandas(encode_seg, SEGMENT_SCHEMA)
    )


# ---------------------------------------------------------------------- #
# decode + merge
# ---------------------------------------------------------------------- #


def decode_blocks(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Block rows of ONE (seg, term) — sorted by block_id — → (doc_ids, tfs)."""
    ids, tfs, _ = decode_blocks_pos(rows)
    return ids, tfs


def decode_blocks_pos(
    rows: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Like :func:`decode_blocks` but also returns the occurrence-aligned
    per-doc position deltas (None if the segment was built without
    positions)."""
    ids = []
    tfs = []
    pos = []
    has_pos = True
    for r in rows.sort_values("block_id").itertuples(index=False):
        ids.append(codec.delta_decode(codec.varbyte_decode(r.doc_gaps, r.n)))
        t = codec.varbyte_decode(r.tfs, r.n)
        tfs.append(t)
        buf = getattr(r, "positions", b"") or b""
        if len(buf) == 0 and int(t.sum()) > 0:
            has_pos = False
        elif has_pos:
            pos.append(codec.varbyte_decode(bytes(buf), int(t.sum())))
    if not ids:
        empty = np.array([], dtype=np.uint64)
        return empty, empty.copy(), empty.copy()
    return (
        np.concatenate(ids),
        np.concatenate(tfs),
        np.concatenate(pos) if has_pos and pos else (None if not has_pos else np.array([], dtype=np.uint64)),
    )


def positions_per_doc(
    tfs: np.ndarray, pos_deltas: np.ndarray
) -> list[np.ndarray]:
    """Occurrence-aligned per-doc deltas → list of absolute position
    arrays, one per posting (cumsum within each doc's slice)."""
    bounds = np.concatenate(([0], np.cumsum(tfs.astype(np.int64)))).astype(
        np.int64
    )
    return [
        np.cumsum(pos_deltas[bounds[i] : bounds[i + 1]], dtype=np.uint64)
        for i in range(tfs.size)
    ]


def merge_segments(
    segments: DataFrame,
    norms: DataFrame,
    group: int = 2,
) -> DataFrame:
    """One tree-merge round: coalesce ``group`` adjacent segments.

    Needs NO global statistics: per-block min_dl/max_tf/sum_tf merge by
    re-encode over the concatenated postings; quantized lengths come from
    the norm bytes (cogrouped per new segment). Returns (merged_segments,
    merged_norms).
    """
    new_seg = (F.col("seg_id") / group).cast("long")
    src = segments.withColumn("_new_seg", new_seg)
    # alias every norm column to a FRESH name: when segments and norms
    # come from the same parent plan (split_single_pass), the cogroup's
    # attribute dedup silently drops right-side columns whose expression
    # ids also appear on the left (seg_id, first_doc) — fresh aliases
    # force new expression ids on every column.
    n_src = norms.select(
        new_seg.alias("_new_seg"),
        F.col("first_doc").alias("_first_doc"),
        F.col("n_docs").alias("_n_docs"),
        F.col("sum_dl").alias("_sum_dl"),
        F.col("norm_bytes").alias("_norm_bytes"),
    )

    def merge_group(key, pdfs: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        if pdfs.empty or npdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        (new_seg_id,) = key
        first = int(npdf["_first_doc"].min())
        norm_parts = npdf.sort_values("_first_doc")
        total = int(
            (norm_parts["_first_doc"] + norm_parts["_n_docs"]).max() - first
        )
        norm_arr = np.zeros(total, dtype=np.uint8)
        for fd, nd, nb in zip(
            norm_parts["_first_doc"],
            norm_parts["_n_docs"],
            norm_parts["_norm_bytes"],
        ):
            off = int(fd) - first
            norm_arr[off : off + int(nd)] = np.frombuffer(nb, dtype=np.uint8)
        dl_all = codec.byte4_to_int(norm_arr)

        out = []
        for (term, bucket), rows in pdfs.groupby(["term", "bucket"], sort=False):
            parts = [
                decode_blocks_pos(seg_rows)
                for _, seg_rows in sorted(
                    rows.groupby("seg_id", sort=True), key=lambda kv: kv[0]
                )
            ]
            doc_ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            # per-doc deltas are self-contained (first position absolute),
            # so merged position streams concatenate without re-encoding
            has_pos = [p[2] is not None for p in parts]
            if all(has_pos):
                pos_deltas = np.concatenate([p[2] for p in parts])
            elif not any(has_pos):
                pos_deltas = None
            else:
                # a silent degrade here would drop positions from the
                # merged stream and phrase queries would fail much later
                # with no hint of which merge lost them — fail loudly at
                # the merge instead
                raise ValueError(
                    f"merge_segments: term {term!r} in merged seg "
                    f"{new_seg_id} mixes positional and positions-free "
                    "source segments; rebuild the positions-free segment "
                    "with a 'pos' column before merging"
                )
            dl_q = dl_all[(doc_ids.astype(np.int64) - first)]
            out.extend(
                _encode_term_blocks(
                    term,
                    int(bucket),
                    int(new_seg_id),
                    doc_ids,
                    tfs,
                    dl_q,
                    pos_deltas,
                )
            )
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series(dtype=object) for c in cols}
        )

    def merge_norms(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["_new_seg"].iloc[0])
        parts = pdf.sort_values("_first_doc")
        first = int(parts["_first_doc"].min())
        total = int((parts["_first_doc"] + parts["_n_docs"]).max() - first)
        arr = np.zeros(total, dtype=np.uint8)
        for fd, nd, nb in zip(
            parts["_first_doc"], parts["_n_docs"], parts["_norm_bytes"]
        ):
            off = int(fd) - first
            arr[off : off + int(nd)] = np.frombuffer(nb, dtype=np.uint8)
        return pd.DataFrame(
            [(seg, first, total, int(parts["_sum_dl"].sum()), arr.tobytes())],
            columns=[f.name for f in NORMS_SCHEMA.fields],
        )

    merged = (
        src.groupby("_new_seg")
        .cogroup(n_src.groupby("_new_seg"))
        .applyInPandas(merge_group, SEGMENT_SCHEMA)
    )
    new_norms = n_src.groupBy("_new_seg").applyInPandas(merge_norms, NORMS_SCHEMA)
    return merged, new_norms
