"""BM25 ranked-retrieval tests (operators/bm25.py)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from educational_vector_database_spark.operators import bm25 as B
from educational_vector_database_spark.session import load_table


def _norm_tokens(text):
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return [x for x in re.sub(r"\s+", " ", t).strip().split(" ") if x]


def _py_bm25(doc_rows, terms, k, k1_x10=12, b_x100=75):
    """Integer replica of the scaled BM25 (same DIV floors)."""
    toks = {d: _norm_tokens(t) for d, t in doc_rows}
    n = len(doc_rows)
    total = sum(len(v) for v in toks.values())
    c1 = k1_x10 * (100 - b_x100) // 100
    c2 = k1_x10 * b_x100 // 100
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = []
    for d, v in toks.items():
        s, nt = 0, 0
        for t in terms:
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            nt += 1
            idf = round(math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) * 1e6)
            num = (10 + k1_x10) * idf * tf * total
            den = 10 * total * tf + c1 * total + c2 * len(v) * n
            s += num // den
        if nt:
            out.append((d, nt, s))
    out.sort(key=lambda x: (-x[2], x[0]))
    return out[:k]


def test_bm25_matches_python_replica(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    terms = ["spark", "filter", "join", "window"]
    got = [
        (r.doc_id, r.n_terms, r.bm25_scaled)
        for r in B.bm25_topk(docs, terms, k=10).collect()
    ]
    assert got == _py_bm25(rows, terms, 10)


def test_bm25_rare_term_outweighs_common(spark):
    """idf does its job: a doc matching a corpus-rare term beats a doc
    matching an everywhere-term, at equal tf and length."""
    rows = [(i, "common common filler words here") for i in range(9)]
    rows.append((100, "zebra common filler words here"))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = B.bm25_topk(docs, ["zebra", "common"], k=3).collect()
    assert got[0].doc_id == 100 and got[0].n_terms == 2


def test_bm25_length_normalization(spark):
    """b>0 penalizes long documents: same tf, longer doc scores lower."""
    docs = spark.createDataFrame(
        [(1, "apple " + "pad " * 4), (2, "apple " + "pad " * 40)],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.bm25_scaled for r in B.bm25_topk(docs, ["apple"], k=2).collect()}
    assert got[1] > got[2]


def test_bm25_rejects_inexpressible_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="k1_x10"):
        B.bm25_topk(docs, ["a"], k1_x10=13, b_x100=77)
