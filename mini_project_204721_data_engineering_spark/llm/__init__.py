"""LLM-training-data pipeline operators (mandated extension, SURVEY §7 Phase 5).

Not present in the reference (its surface is geospatial ETL); these are the
operators a 100 TB text/embedding corpus pipeline needs, built Spark-first:

- :mod:`.text` — tokenization, language-ID heuristic, quality scoring,
  document fingerprinting (all JVM-side Column expressions)
- :mod:`.dedup` — exact (hash), n-gram Jaccard, MinHash-LSH, SimHash
- :mod:`.similarity` — embedding cosine top-k (brute-force baseline +
  label-cell IVF scale path)
- :mod:`.sparse_sim` — exact all-pairs tf-cosine join (prefix-filtered
  inverted index, Bayardo et al. WWW'07)
- :mod:`.pq` — product-quantization ANN (Jégou et al. TPAMI 2011):
  32×-compressed codes, pure-codegen ADC search, shortlist+rerank
- :mod:`.multimodal` — opaque binary columns with typed metadata and
  Arrow-batched decode plumbing (decode itself stubbed: no image/audio
  libs in this environment)
- :mod:`.quality` — repetition metrics, decontamination, vocabulary,
  sequence packing, unigram-LM in-domain scoring
- :mod:`.bpe` — distributed BPE tokenizer induction + broadcast apply
"""
