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
  blocks of ``BLOCK`` docs, with per-block metadata (first/last doc, max
  tf-weight) enabling block-max WAND skipping.
* **Norms**: one byte per doc per segment (Lucene's norm layout), the
  SmallFloat byte4 of the doc length.
* **Merge**: segments with disjoint, ordered doc ranges merge by decode +
  concat + re-encode per term — associative, so a tree of pairwise merge
  rounds (mirroring Lucene's background merges) yields bit-identical
  output to a single-pass build. Property-tested in
  tests/test_segments.py.

Schema of the postings-segment table (one row per term-block):

    bucket: int        -- hash(term) % n_buckets: file-level pruning key
    seg_id: long       -- docId-range segment
    term:   string
    block_id: int
    n:      int        -- postings in this block (<= BLOCK)
    doc_gaps: binary   -- varbyte(delta(doc_ids))
    tfs:    binary     -- varbyte(tfs)
    first_doc, last_doc: long
    max_tf: int
    block_max_w: double -- max_{p in block} tf_w(tf, dl_q) with corpus
                           k1/b/avgdl: the block-max impact bound (x idf)

Norms table: (seg_id, first_doc, n_docs, norm_bytes: binary).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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
        StructField("block_max_w", DoubleType()),
    ]
)

NORMS_SCHEMA = StructType(
    [
        StructField("seg_id", LongType()),
        StructField("first_doc", LongType()),
        StructField("n_docs", IntegerType()),
        StructField("norm_bytes", BinaryType()),
    ]
)


def tf_weight(tf: np.ndarray, dl_q: np.ndarray, avgdl: float) -> np.ndarray:
    """Lucene-8 BM25 tf weight (no (k1+1) numerator), vectorized."""
    tf = tf.astype(np.float64)
    return tf / (tf + K1 * (1.0 - B + B * dl_q.astype(np.float64) / avgdl))


def _encode_term_blocks(
    term: str,
    bucket: int,
    seg_id: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dl_q: np.ndarray,
    avgdl: float,
) -> list[tuple]:
    """One term's postings (sorted by doc) → block rows."""
    rows = []
    for b0 in range(0, doc_ids.size, BLOCK):
        d = doc_ids[b0 : b0 + BLOCK]
        t = tfs[b0 : b0 + BLOCK]
        w = tf_weight(t, dl_q[b0 : b0 + BLOCK], avgdl)
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
                float(w.max()),
            )
        )
    return rows


def build_segments(
    postings: DataFrame,
    doc_lens: DataFrame,
    avgdl: float,
    seg_size: int = DEFAULT_SEG_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Uncompressed postings (term, doc_id, tf) → compressed segment rows.

    Plan: attach seg_id, join quantized doc lengths, then one grouped-map
    kernel per (seg_id, bucket) encodes every term of that bucket with
    numpy. Granularity rationale:

    * skew: group size ≈ (postings in segment) / n_buckets — bounded by
      seg_size × avgdl / n_buckets no matter how hot any term is (the hot
      term contributes ≤ seg_size postings to its bucket's group);
    * overhead: per-group Spark/Arrow cost is paid per (seg, bucket), not
      per (seg, term) — ~vocab/n_buckets terms amortize each group
      (measured 5-10× build speedup vs per-term groups at sf0.1).
    """
    from alix_spark.search.bm25 import with_quantized_dl

    dlq = with_quantized_dl(doc_lens).withColumnRenamed("dl", "dl_q")
    p = (
        postings.select("term", "doc_id", "tf")
        .join(dlq, "doc_id")
        .withColumn("seg_id", (F.col("doc_id") / seg_size).cast("long"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
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
        # contiguous runs per term (pdf sorted by term)
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms)]))
        for s, e in zip(starts, ends):
            rows.extend(
                _encode_term_blocks(
                    terms[s], bucket, seg_id, docs[s:e], tfs[s:e],
                    dlq_arr[s:e], avgdl,
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return p.groupBy("seg_id", "bucket").applyInPandas(encode_group, SEGMENT_SCHEMA)


def build_norms(
    doc_lens: DataFrame, seg_size: int = DEFAULT_SEG_SIZE
) -> DataFrame:
    """doc_lens → per-segment norm-byte arrays (1 byte/doc, Lucene layout).

    Missing docs inside a range (docs with no tokens) get norm byte 0.
    """

    def encode_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(pdf["seg_id"].iloc[0])
        first = seg_id * seg_size
        offs = (pdf["doc_id"].to_numpy(np.int64) - first).astype(np.int64)
        arr = np.zeros(int(offs.max()) + 1, dtype=np.uint8)
        arr[offs] = codec.int_to_byte4(pdf["dl"].to_numpy(np.int64))
        return pd.DataFrame(
            [(seg_id, first, int(arr.size), arr.tobytes())],
            columns=[f.name for f in NORMS_SCHEMA.fields],
        )

    return (
        doc_lens.withColumn("seg_id", (F.col("doc_id") / seg_size).cast("long"))
        .groupBy("seg_id")
        .applyInPandas(encode_seg, NORMS_SCHEMA)
    )


def build_segments_direct(
    tokens: DataFrame,
    norms: DataFrame,
    avgdl: float,
    seg_size: int = DEFAULT_SEG_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Single-shuffle segment build: token stream → compressed blocks.

    The two-stage path (``build_postings`` then ``build_segments``)
    shuffles the corpus twice — once by (term, doc) and once by
    (seg, bucket). This path shuffles ONCE by seg_id (doc range), then
    one kernel per segment computes tf per (term, doc) with a pandas
    groupby, assigns buckets with the Python XXH64 (bit-identical to
    Spark's ``xxhash64`` — tests/test_xxhash.py) and encodes blocks.
    Output is row-identical to the two-stage path (property-tested).

    Group memory = seg_size × avgdl token rows; pick seg_size to bound it.
    Doc-range grouping keeps Zipf-head terms spread exactly as before.
    """
    from alix_spark.index.xxhash import term_bucket

    t = tokens.select(
        "doc_id", "term"
    ).withColumn("seg_id", (F.col("doc_id") / seg_size).cast("long"))

    def encode_seg(key, tok_pdf: pd.DataFrame, norm_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        if tok_pdf.empty or norm_pdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        (seg_id,) = key
        seg_id = int(seg_id)
        first = int(norm_pdf["first_doc"].iloc[0])
        dl_all = codec.byte4_to_int(
            np.frombuffer(norm_pdf["norm_bytes"].iloc[0], dtype=np.uint8)
        )
        tf = (
            tok_pdf.groupby(["term", "doc_id"], sort=True)
            .size()
            .reset_index(name="tf")
        )
        terms = tf["term"].to_numpy()
        docs = tf["doc_id"].to_numpy(np.uint64)
        tfs = tf["tf"].to_numpy(np.int64)
        dl_q = dl_all[(docs.astype(np.int64) - first)]
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(terms)]))
        rows = []
        for s, e in zip(starts, ends):
            term = terms[s]
            rows.extend(
                _encode_term_blocks(
                    term,
                    term_bucket(term, n_buckets),
                    seg_id,
                    docs[s:e],
                    tfs[s:e],
                    dl_q[s:e],
                    avgdl,
                )
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
    ids = []
    tfs = []
    for r in rows.sort_values("block_id").itertuples(index=False):
        ids.append(codec.delta_decode(codec.varbyte_decode(r.doc_gaps, r.n)))
        tfs.append(codec.varbyte_decode(r.tfs, r.n))
    if not ids:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)
    return np.concatenate(ids), np.concatenate(tfs)


def merge_segments(
    segments: DataFrame,
    norms: DataFrame,
    avgdl: float,
    group: int = 2,
    seg_size: int = DEFAULT_SEG_SIZE,
) -> DataFrame:
    """One tree-merge round: coalesce ``group`` adjacent segments into one.

    Mirrors Lucene's merge policy (adjacent-by-doc-order segments merge so
    doc ids stay sorted). Each (new_seg, term) group decodes its source
    blocks, concatenates (ranges are disjoint and ordered), and re-encodes
    with fresh per-block metadata — identical bytes to a direct build at
    the coarser segmentation. Apply repeatedly for a full merge tree.
    """
    new_seg = (F.col("seg_id") / group).cast("long")
    src = segments.withColumn("_new_seg", new_seg)

    # norm arrays are needed to recompute block_max_w; cogroup by new seg
    n_src = norms.withColumn("_new_seg", new_seg)

    def merge_group(key, pdfs: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
        (new_seg_id,) = key
        # rebuild the norm lookup for the merged doc range
        first = int(npdf["first_doc"].min())
        norm_parts = npdf.sort_values("first_doc")
        total = int(
            (norm_parts["first_doc"] + norm_parts["n_docs"]).max() - first
        )
        norm_arr = np.zeros(total, dtype=np.uint8)
        for r in norm_parts.itertuples(index=False):
            off = int(r.first_doc) - first
            norm_arr[off : off + r.n_docs] = np.frombuffer(
                r.norm_bytes, dtype=np.uint8
            )
        dl_all = codec.byte4_to_int(norm_arr)

        out = []
        for (term, bucket), rows in pdfs.groupby(["term", "bucket"], sort=False):
            parts = [
                decode_blocks(seg_rows)
                for _, seg_rows in sorted(
                    rows.groupby("seg_id", sort=True), key=lambda kv: kv[0]
                )
            ]
            doc_ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dl_q = dl_all[(doc_ids.astype(np.int64) - first)]
            out.extend(
                _encode_term_blocks(
                    term, int(bucket), int(new_seg_id), doc_ids, tfs, dl_q, avgdl
                )
            )
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series(dtype=object) for c in cols}
        )

    merged_norms_schema = NORMS_SCHEMA

    def merge_norms(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["_new_seg"].iloc[0])
        parts = pdf.sort_values("first_doc")
        first = int(parts["first_doc"].min())
        total = int((parts["first_doc"] + parts["n_docs"]).max() - first)
        arr = np.zeros(total, dtype=np.uint8)
        for r in parts.itertuples(index=False):
            off = int(r.first_doc) - first
            arr[off : off + r.n_docs] = np.frombuffer(r.norm_bytes, dtype=np.uint8)
        return pd.DataFrame(
            [(seg, first, total, arr.tobytes())],
            columns=[f.name for f in merged_norms_schema.fields],
        )

    merged = (
        src.groupby("_new_seg")
        .cogroup(n_src.groupby("_new_seg"))
        .applyInPandas(merge_group, SEGMENT_SCHEMA)
    )
    new_norms = n_src.groupBy("_new_seg").applyInPandas(
        merge_norms, merged_norms_schema
    )
    return merged, new_norms
