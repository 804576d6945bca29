#!/usr/bin/env python3
"""Open-vocabulary document fixture generator (VERDICT r6 #3).

The driver's synthetic documents table draws from a CLOSED ~31-word
vocabulary — adversarial for exact-similarity candidate generation
(dedup_prefix_filter's candidate floor is inherent there: with 31
token types every prefix token is hot, so candidates are quadratic).
Real corpora are Zipfian with an OPEN vocabulary: the type count grows
with the corpus and most types are rare, so a rarest-first prefix
lands on df-bounded tokens and candidate buckets stay small. This
generator produces that fixture so the df-bounded-buckets claim is a
measured number, not an argument:

- vocabulary size V = n_docs (grows linearly with the corpus);
- token ranks drawn Zipf-ish via inverse CDF r = floor(V^u) (s≈1:
  p(r) ∝ 1/r), so a few hot function-word-like types plus a long
  rare tail — natural text's shape;
- 10% of docs are near-duplicates of an earlier doc (5% token
  replacement) so the dedup operators have true positives to find;
- schema matches the driver's documents.parquet exactly
  (doc_id, text, lang, source, n_chars).

Usage: python3 scripts/gen_open_vocab_corpus.py [n_docs] [out_dir] [seed]
Defaults: 5000 /tmp/openvocab_5k 7
Companion tables are NOT written — point SPARK_GRAFT_ONLY at the
documents-only dedup queries.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen(n_docs, out, seed):
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    V = max(1000, n_docs)
    doc_ids, texts = [], []
    for d in range(n_docs):
        if d > 100 and rng.random() < 0.10:
            # near-duplicate of an earlier doc: 5% token replacement
            src = int(rng.integers(0, d))
            toks = list(texts[src].split())
            for i in range(len(toks)):
                if rng.random() < 0.05:
                    r = int(V ** rng.random())
                    toks[i] = f"w{r}"
        else:
            n_tok = int(rng.integers(30, 120))
            ranks = np.floor(V ** rng.random(n_tok)).astype(np.int64)
            toks = [f"w{r}" for r in ranks]
        doc_ids.append(d)
        texts.append(" ".join(toks))
    langs = [["en", "de", "fr"][d % 3] for d in range(n_docs)]
    sources = [f"src{d % 5}" for d in range(n_docs)]
    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, f"{out}/documents.parquet")
    n_types = len({t for txt in texts for t in txt.split()})
    print(f"{out}: {n_docs} docs, {n_types} distinct token types "
          f"(open vocab — grows with corpus)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/openvocab_5k"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    gen(n, out, seed)
