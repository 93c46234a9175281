#!/usr/bin/env python3
"""Generate the Lucene BM25 rank-identity golden fixtures.

Pre-tokenizes the documents table with the alix_spark simple chain (pure
Python equivalent — no Spark needed), feeds the corpus + reference query
set through LuceneBM25Oracle (compiled against the reference's own
lucene-core-8.8.1.jar), and writes tests/golden/lucene_topk_<sf>.json.

Run once per test-data generation; the golden files are checked in, so
pytest never needs Java.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[2]
LUCENE_JAR = "/root/reference/lib/lucene-core-8.8.1.jar"
ANALYSIS_JAR = "/root/reference/lib/lucene-analyzers-common-8.8.1.jar"
ORACLE_DIR = Path(__file__).resolve().parent

SPLIT = re.compile(r"[^a-z0-9]+")

# the reference query set (FIXTURES.md §2): single terms, multi-term OR,
# +must / -mustnot, repeated-term, rare terms
QUERIES = [
    "fast",
    "merge",
    "window",
    "fast join",
    "fast join merge",
    "scan column order",
    "+fast join",
    "+fast +join",
    "+fast -window",
    "fast -window",
    "+merge -scan +sort",
    "table scan merge part window small hash",
    "query row data slow",
    "customer line batch value",
    "fast fast",
    "spark group query",
    "stream filter",
    "vector hash agg",
    "key order sort",
    "part small the",
]


# exact-phrase golden set (PhraseQuery, slop 0) — bigrams verified present
# in the sf0.001/sf0.01 corpora plus no-match and single-term edge cases
PHRASE_QUERIES = [
    '"part filter"',
    '"order order"',
    '"order fast"',
    '"agg part"',
    '"stream column"',
    '"table hash"',
    '"merge group"',
    '"part filter fast"',
    '"fast"',
]


def tokenize(text: str) -> list[str]:
    return [t for t in SPLIT.split(text.lower()) if t]


def main(sf_dir: str, out_name: str, query_set: str = "boolean") -> None:
    qlist = PHRASE_QUERIES if query_set == "phrase" else QUERIES
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    with tempfile.TemporaryDirectory() as td:
        corpus = Path(td) / "corpus.tsv"
        with corpus.open("w") as f:
            for doc_id, text in rows:
                f.write(f"{doc_id}\t{' '.join(tokenize(text))}\n")
        queries = Path(td) / "queries.txt"
        queries.write_text("\n".join(qlist) + "\n")

        cp = f"{ORACLE_DIR}:{LUCENE_JAR}:{ANALYSIS_JAR}"
        subprocess.run(
            ["javac", "-cp", cp, str(ORACLE_DIR / "LuceneBM25Oracle.java")],
            check=True,
        )
        out = subprocess.run(
            [
                "java",
                "-cp",
                cp,
                "LuceneBM25Oracle",
                str(corpus),
                str(queries),
                "10",
            ],
            check=True,
            capture_output=True,
            text=True,
        ).stdout
    results = [json.loads(line) for line in out.strip().splitlines()]
    golden = REPO / "tests" / "golden" / out_name
    golden.write_text(json.dumps(results, indent=1))
    print(f"wrote {golden} ({len(results)} queries)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         sys.argv[2] if len(sys.argv) > 2 else "lucene_topk_sf0.001.json",
         sys.argv[3] if len(sys.argv) > 3 else "boolean")
