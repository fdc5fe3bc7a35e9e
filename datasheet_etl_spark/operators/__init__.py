"""Reusable relational operator shapes.

- ``relational``  : positional zip join, span/range join, incremental
  anti-join, top-1-per-group, forward fill, run-length spans, sessionize,
  dynamic pivot/unpivot
- ``dedup``       : exact, minhash-LSH, simhash, n-gram Jaccard,
  embedding-cosine near-dup
- ``similarity``  : brute-force cosine top-k + LSH/IVF bucketed ANN
- ``text``        : language-ID, quality scoring, token counting,
  fingerprinting
- ``multimodal``  : binary-column plumbing with stubbed decoders
"""
