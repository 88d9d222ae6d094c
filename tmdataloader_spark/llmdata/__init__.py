"""Large-scale training-data pipeline operators (BASELINE.json
north-star: dedup families, similarity search, multimodal columns,
text analysis) — extensions beyond the reference's surface, designed
for 100 TB first:

- ``dedup``      : exact hash-dedup, MinHash+LSH banding, SimHash with
                   lossless pigeonhole blocking, embedding-cosine pairs
- ``similarity`` : brute-force cosine top-k (expression and NumPy
                   paths), random-hyperplane LSH ANN
- ``text``       : language-ID heuristic, quality scoring, token
                   counting, fingerprinting — all JVM-side expressions
- ``multimodal`` : opaque binary columns + typed metadata, Arrow-
                   batched decode / resize / frame-sample plumbing;
                   REAL decode for PNG images (vendored
                   functions/png.py) and WAV audio (vendored
                   functions/wav.py — header probe_audio plus
                   audio_features RMS/peak/ZCR); only video frame
                   sampling stays ffmpeg-stubbed
- ``sampling``   : deterministic hash splits / Bernoulli / stratified
                   samples — pure per-row expressions, engine-portable
                   — plus two-phase per-stratum quota (top-k) sampling
- ``clustering`` : integer-exact distributed k-means and
                   SemDeDup-style cluster-bounded semantic dedup
- ``packing``    : concat-and-chunk sequence packing onto a fixed
                   token budget via a two-phase distributed prefix sum
- ``vocab``      : vocabulary census (tf/df), heavy-hitter top-k via
                   per-task k-heaps, per-source log2 length profile
- ``layout``     : Z-order (Morton) data layout — integer-exact
                   quantize + bit interleave + repartitionByRange for
                   scan-pruning parquet file stats
- ``incremental``: batch-vs-history novelty via a persisted signature
                   store — history text is never rescanned
- ``chunking``   : overlapping fixed-size windows with char offsets
                   (RAG / long-document embedding preprocessing)
- ``curate``     : the composed keep/drop verdict pipeline
- ``pipeline``   : the full assembly line — curate → token count +
                   deterministic splits → packed train tape
"""
