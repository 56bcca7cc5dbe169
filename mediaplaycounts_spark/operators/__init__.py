"""Library-level operators beyond the reference's surface.

Large-scale training-data-pipeline operators (BASELINE.json north star:
dedup, similarity search, multimodal columns, text analysis), each
implemented as a composition of built-in DataFrame operations (JVM-side,
whole-stage-codegen'd) unless Python is genuinely required — and then
always Arrow-batched (mapInPandas / pandas_udf), never row-at-a-time.

Modules:
- dedup       — exact / content-hash / MinHash-LSH / SimHash / n-gram
                Jaccard duplicate detection
- similarity  — cosine similarity, brute-force and LSH-bucketed ANN
- textstats   — language-ID heuristic, quality scoring, token counting,
                document fingerprinting
- multimodal  — opaque binary columns with typed metadata; Arrow-batched
                decode/feature plumbing (decode itself stubbed: no
                image/audio libs in this container)
"""
