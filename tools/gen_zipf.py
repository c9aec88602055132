"""Seeded Zipf-vocabulary corpus fixture generator.

The driver's synthetic documents table draws from a ~31-word vocabulary —
the degenerate case for every df-sensitive text operator (prefix filtering,
TF-IDF, BM25): with so few distinct tokens, every token is near-universal
and candidate generation approaches all-pairs. Real corpora are Zipfian
(rank-frequency ≈ 1/rank^s with s ≈ 1); this tool writes a documents table
with the SAME schema (doc_id, text, lang, source, n_chars) but a ~50k-word
Zipf vocabulary, so the engine can demonstrate its text-operator scale
behavior on data shaped like its 100 TB target (VERDICT r3 "What's missing"
#3).

Deterministic: a fixed numpy PCG64 seed, no wall-clock anywhere. ~7% of
documents are near-duplicates of an earlier document (a few tokens swapped
or dropped) so the set-similarity join has non-trivial output at t=0.7.

Usage: python tools/gen_zipf.py [n_docs] [out_dir]
Defaults: 5000 docs (sf0.1-scale) → /root/repo/fixtures/zipf0.1/
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
SEED = 20260814
LANGS = ["en", "de", "fr", "es", "zh", "nl"]
DUP_FRACTION = 0.07


def _vocab() -> list[str]:
    # pronounceable-ish deterministic words: base-20 consonant-vowel coding
    cons = "bcdfghjklmnpqrstvwxz"
    vows = "aeiou"
    out = []
    for i in range(VOCAB_SIZE):
        n, parts = i, []
        while True:
            parts.append(cons[n % 20] + vows[(n // 20) % 5])
            n //= 100
            if n == 0:
                break
        out.append("".join(parts))
    return out


def generate(n_docs: int) -> dict[str, list]:
    rng = np.random.default_rng(SEED)
    vocab = np.array(_vocab())
    # Zipf over ranks 1..V: p(r) ∝ 1/r^s (np.random.zipf has unbounded
    # support; an explicit normalized pmf keeps every draw inside the vocab)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    pmf = ranks**-ZIPF_S
    pmf /= pmf.sum()

    doc_ids, texts, langs, sources = [], [], [], []
    for i in range(n_docs):
        if i > 0 and rng.random() < DUP_FRACTION:
            # near-duplicate of a recent doc: swap/drop up to 3 tokens
            src = texts[int(rng.integers(max(0, i - 50), i))].split(" ")
            toks = list(src)
            for _ in range(int(rng.integers(0, 4))):
                j = int(rng.integers(0, len(toks)))
                if rng.random() < 0.5 and len(toks) > 10:
                    toks.pop(j)
                else:
                    toks[j] = vocab[rng.choice(VOCAB_SIZE, p=pmf)]
            text = " ".join(toks)
        else:
            length = int(rng.integers(40, 121))
            text = " ".join(vocab[rng.choice(VOCAB_SIZE, p=pmf, size=length)])
        doc_ids.append(i)
        texts.append(text)
        langs.append(LANGS[int(rng.integers(0, len(LANGS)))])
        sources.append(f"src{int(rng.integers(0, 8))}")
    return {
        "doc_id": doc_ids,
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": [len(t) for t in texts],
    }


def main(n_docs: int | None = None, out_dir: str | None = None) -> None:
    if n_docs is None:
        n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    if out_dir is None:
        out_dir = (
            sys.argv[2]
            if len(sys.argv) > 2
            else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "zipf0.1")
        )
    os.makedirs(out_dir, exist_ok=True)
    cols = generate(n_docs)
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "source": pa.array(cols["source"], pa.string()),
            "n_chars": pa.array(cols["n_chars"], pa.int64()),
        }
    )
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(table, path)
    print(f"wrote {table.num_rows} docs → {path}")


if __name__ == "__main__":
    main()
