#!/usr/bin/env python3
"""Deterministically synthesize a larger documents/embeddings corpus in
the exact shape of the driver's testdata (TESTDATA.md; sf0.1 = 5,000
docs / 2,000 vectors), for scale-step benchmarking (VERDICT r4 next #8:
"run the headline suite at sf1 = 50k docs once").

The token vocabulary and its empirical frequency distribution, the
document-length distribution, and the lang/source mixes are all
MEASURED from the read-only sf0.1 tables, then re-sampled at N× scale
with a fixed seed — no external data, fully reproducible. Embedding
vectors are seeded standard normals at the measured dimension with the
measured label cardinality.

Usage: python3 tools/gen_sf.py <out_dir> [scale=10] [seed=42]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(seed)

    # measured vocabulary + frequencies (whitespace tokens)
    vocab = con.execute(
        f"""
        SELECT tok, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM read_parquet('{SRC}/documents.parquet')
        ) WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok
        """
    ).fetchall()
    words = np.array([w for w, _ in vocab])
    probs = np.array([n for _, n in vocab], dtype=float)
    probs /= probs.sum()

    # measured doc-length (token-count), lang, source distributions
    lens = np.array(
        [
            r[0]
            for r in con.execute(
                f"""
        SELECT len(string_split(text, ' ')) FROM
        read_parquet('{SRC}/documents.parquet')
        """
            ).fetchall()
        ]
    )
    langs = [
        r[0]
        for r in con.execute(
            f"SELECT lang FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchall()
    ]
    sources = [
        r[0]
        for r in con.execute(
            f"SELECT source FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchall()
    ]
    n_docs = len(lens) * scale

    doc_lens = rng.choice(lens, size=n_docs, replace=True)
    texts = []
    total = int(doc_lens.sum())
    flat = rng.choice(words, size=total, p=probs)
    off = 0
    for dl in doc_lens:
        texts.append(" ".join(flat[off : off + dl]))
        off += dl
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [langs[i % len(langs)] for i in range(n_docs)], pa.string()
            ),
            "source": pa.array(
                [sources[i % len(sources)] for i in range(n_docs)],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")

    dim, n_vec, n_labels = con.execute(
        f"""
        SELECT any_value(len(embedding)), count(*),
               count(DISTINCT label)
        FROM read_parquet('{SRC}/embeddings.parquet')
        """
    ).fetchone()
    n_vec *= scale
    vecs = rng.standard_normal((n_vec, dim)).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(
                [i % n_labels for i in range(n_vec)], pa.int32()
            ),
        }
    )
    pq.write_table(emb, out / "embeddings.parquet")
    print(
        f"wrote {n_docs} docs ({int(doc_lens.sum())} tokens, "
        f"vocab {len(words)}) + {n_vec} embeddings (dim {dim}) -> {out}"
    )


if __name__ == "__main__":
    main()
