"""Byte-pair encoding — learn merges and apply them, wholly in-plan
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units", ACL — the BPE tokenizer at the root of
modern vocabularies). Complements ``text.bpeish_token_count`` (a
regex heuristic) with the real algorithm.

Encoding invariant (the whole trick)
------------------------------------
A document is a string of SYMBOLS joined by TWO spaces, padded with
one space at each end; word boundaries are the never-merged symbol
``|``::

    "ab cd"  ->  " a  b  |  c  d "

A merge of pair (X, Y) is then the PLAIN string replacement
``" X  Y "`` → ``" XY "``. Because adjacent candidate matches each
borrow one space from the double separator, left-to-right
non-overlapping replace — which is what both Spark's ``replace`` and
DuckDB's ``replace`` do — is EXACT greedy BPE application: in
``" a  b  a  b "`` the first match consumes indices 0-5 and the
second starts cleanly at 6 (a naive single-space encoding loses every
other match to overlap, the classic BPE implementation bug). The
replacement re-establishes the invariant, so merges chain.

Consequences: application is a pure whole-stage-codegen expression
(k sequential ``replace`` calls — no UDF, no shuffle), deterministic,
and the DuckDB oracle replays learning AND application exactly (the
kmeans-style unrolled-iteration oracle).

100 TB shape: LEARNING scans the corpus once per merge (count pairs →
argmax → fold the merge into the expression), with per-iteration
top-1 selection via ``orderBy().limit(1)`` (k-heaps) and only one
(pair, count) row ever reaching the driver per round — learn on a
``hash_sample`` for web scale (the standard practice; merges are
statistics, not per-row state). APPLICATION is embarrassingly
parallel: one map over the corpus regardless of k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: word-boundary symbol — excluded from every merge
SEP = "|"


def symbolize(text: Column | str) -> Column:
    """Initial symbol string: lowercase, words split to characters,
    ``|`` between words, double-space joined, single-space padded."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.regexp_replace(F.trim(F.lower(c)), " +", SEP)
    spaced = F.regexp_replace(words, "(.)", "$1  ")
    return F.concat(F.lit(" "), F.trim(spaced), F.lit(" "))


def apply_merges(enc: Column, merges: list[tuple[str, str]]) -> Column:
    """Fold ``merges`` (in learned priority order) into ``enc`` as
    plain string replacements — the exact greedy BPE apply."""
    out = enc
    for x, y in merges:
        out = F.replace(out, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} "))
    return out


def _symbols(enc: Column) -> Column:
    return F.split(F.trim(enc), "  ")


def _pairs(enc: Column) -> Column:
    """Adjacent symbol pairs as "X Y" strings, boundary pairs
    excluded. zip_with over the array and its shift-by-one — one
    linear pass, the same kernel shape as ``dedup._word_ngrams``
    (an index-loop with per-index element_at measured ~10x slower
    on the symbol stream)."""
    s = _symbols(enc)
    pair = F.zip_with(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.filter(
        pair,
        lambda p: ~p.startswith(f"{SEP} ") & ~p.endswith(f" {SEP}"),
    )


def _learn_local(enc_strings: list[str], k: int) -> list[tuple[str, str]]:
    """Driver-local merge learning over COLLECTED symbolized strings —
    bit-identical to the distributed loop's algebra: per round, count
    adjacent symbol pairs (boundary ``|`` pairs excluded, no pairing
    across documents), take max count with ties broken by the
    ``"X Y"`` pair string ascending (Python str comparison is
    code-point order == Spark's UTF8 binary ordering — UTF-8
    preserves code-point order), then greedy left-to-right
    non-overlapping merge (the double-space ``replace`` semantics).

    numpy kernel: the corpus is ONE int32 symbol-id array with a
    sentinel between documents; a round is one vectorized pair-key
    ``np.unique`` + a small Python de-overlap walk over the match
    positions only."""
    import numpy as np

    vocab: dict[str, int] = {}
    ids: list[str] = []

    def sym_id(s: str) -> int:
        i = vocab.get(s)
        if i is None:
            i = len(ids)
            vocab[s] = i
            ids.append(s)
        return i

    sep_id = sym_id(SEP)
    sentinel = sym_id("\x00doc\x00")  # never a real symbol
    chunks: list[list[int]] = []
    for enc in enc_strings:
        syms = enc.strip().split("  ")
        if syms == [""]:
            continue
        chunks.append([sym_id(s) for s in syms] + [sentinel])
    if not chunks:
        return []
    a = np.array([i for c in chunks for i in c], dtype=np.int64)

    merges: list[tuple[str, str]] = []
    for _ in range(k):
        if len(a) < 2:
            break
        left, right = a[:-1], a[1:]
        valid = (
            (left != sep_id) & (right != sep_id)
            & (left != sentinel) & (right != sentinel)
        )
        if not valid.any():
            break
        n_sym = len(ids)
        keys = left[valid] * n_sym + right[valid]
        uniq, counts = np.unique(keys, return_counts=True)
        best_n = counts.max()
        cands = uniq[counts == best_n]
        # tie-break: minimum "X Y" string (binary == code-point order)
        best = min(
            ((ids[int(kk) // n_sym], ids[int(kk) % n_sym]) for kk in cands),
            key=lambda xy: f"{xy[0]} {xy[1]}",
        )
        x, y = best
        merges.append((x, y))
        new_id = sym_id(x + y)
        xi, yi = vocab[x], vocab[y]
        match = np.flatnonzero((a[:-1] == xi) & (a[1:] == yi))
        kept = []
        last = -2
        for i in match:  # greedy left-to-right de-overlap
            if i == last + 1:
                continue
            kept.append(i)
            last = i
        kept_arr = np.array(kept, dtype=np.int64)
        drop = np.zeros(len(a), dtype=bool)
        drop[kept_arr + 1] = True
        a[kept_arr] = new_id
        a = a[~drop]
    return merges


def bpe_learn(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float | None = None,
    salt: str = "bpe",
    local_threshold_rows: int = 200_000,
    local_threshold_bytes: int = 256 << 20,
) -> list[tuple[str, str]]:
    """Learn ``k`` merges: per round, count adjacent symbol pairs
    over the (progressively merged) corpus encoding and take the most
    frequent, ties broken by pair string ascending — deterministic in
    any engine. Returns the merge list in priority order (the model;
    k rows of driver traffic total, like kmeans centroids).

    ``sample_fraction`` learns on a deterministic ``hash_sample`` of
    the corpus — the standard tokenizer-training practice (merges are
    corpus statistics; a hash sample's pair distribution converges
    long before the full 100 TB is seen) and the scale path: learning
    cost becomes sample-sized while :func:`bpe_apply` still encodes
    everything. The sample predicate is the oracle-portable md5
    bucket, so a SQL twin learns from the IDENTICAL subset.

    Each round re-encodes incrementally (one ``replace`` over the
    cached previous encoding, cache swapped per round and dropped at
    the end) instead of replaying all i merges from raw text — the
    learning loop is O(k) replaces total, not O(k²).

    When the (sampled) training set is at most ``local_threshold_rows``
    rows, learning runs DRIVER-LOCALLY over the collected symbolized
    strings instead (:func:`_learn_local` — bit-identical merge
    selection, asserted by tests): a tokenizer training set is
    driver-scale BY DESIGN (the industry trains tokenizers in one
    process on a bounded sample; merges are corpus statistics), and
    the k-round Spark loop pays 2k job latencies to compute what one
    vectorized pass does in milliseconds. Above the threshold — or
    with ``local_threshold_rows=0`` — the distributed loop runs, so an
    unsampled 100 TB corpus never funnels through the driver. The
    collect here is the ONE deliberately sample-sized (not k-sized)
    driver transfer in the library, bounded by the threshold.

    Rows alone don't bound the transfer (r9 ADVICE: 200k multi-MB
    documents pass the row gate yet OOM the driver), so the probe also
    sums ``octet_length(text)`` over the row-bounded prefix and
    requires it ≤ ``local_threshold_bytes`` (default 256 MiB of raw
    text; symbolized strings are ~2-3×, still driver-sized) — above
    either bound the distributed loop runs."""
    base = df.select(F.col(id_col), F.col(text_col))
    if sample_fraction is not None:
        from tmdataloader_spark.llmdata.sampling import hash_sample

        base = hash_sample(base, sample_fraction, id_col=id_col, salt=salt)
    if local_threshold_rows:
        probe = (
            base.limit(local_threshold_rows + 1)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.octet_length(F.col(text_col))).alias("nbytes"),
            )
            .collect()[0]
        )
        sample_n = probe["n"]
        sample_bytes = probe["nbytes"] or 0
        if sample_n <= local_threshold_rows and sample_bytes <= local_threshold_bytes:
            rows = base.select(
                symbolize(F.col(text_col)).alias("_enc")
            ).collect()
            return _learn_local([r._enc for r in rows], k)
    enc = base.select(symbolize(F.col(text_col)).alias("_enc")).cache()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(k):
            top = (
                enc.select(F.explode(_pairs(F.col("_enc"))).alias("pair"))
                .groupBy("pair")
                .agg(F.count("*").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            x, y = top[0]["pair"].split(" ", 1)
            merges.append((x, y))
            nxt = enc.select(
                apply_merges(F.col("_enc"), [(x, y)]).alias("_enc")
            ).cache()
            nxt.count()  # materialize before dropping the parent cache
            enc.unpersist()
            enc = nxt
        return merges
    finally:
        enc.unpersist()


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with a learned merge list. Output:
    ``(id, n_pieces, enc_md5)`` — the piece count (boundary symbols
    excluded) and an md5 of the full symbol string so the oracle
    verifies the exact encoding, not just its length."""
    enc = apply_merges(symbolize(F.col(text_col)), merges)
    syms = _symbols(enc)
    n = F.size(F.filter(syms, lambda s: (s != SEP) & (s != F.lit(""))))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_pieces"),
        F.md5(enc).alias("enc_md5"),
    )


def bpe_oracle_sql(
    k: int = 8,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float | None = None,
    salt: str = "bpe",
) -> str:
    """DuckDB twin replaying learning AND application: ``k`` unrolled
    stages (the kmeans-oracle pattern), each extracting the argmax
    pair from the previous stage's encoding and folding the same
    plain-string replacement in. With ``sample_fraction`` the
    learning stages see the identical md5-bucket sample
    :func:`bpe_learn` uses, while the final stage encodes the FULL
    table (matching ``bpe_apply``)."""
    sym = (
        f"' ' || trim(regexp_replace(regexp_replace(trim(lower({text_col})),"
        f" ' +', '{SEP}', 'g'), '(.)', '\\1  ', 'g')) || ' '"
    )
    ctes = [f"e0f AS (SELECT {id_col}, {sym} AS enc FROM {table})"]
    if sample_fraction is not None:
        thr = int(round(sample_fraction * 1_000_000))
        ctes.append(
            f"""e0 AS (
              SELECT * FROM e0f
              WHERE ('0x'||left(md5('{salt}:'||CAST({id_col} AS VARCHAR)),8))::bigint
                    % 1000000 < {thr}
            )"""
        )
    else:
        ctes.append(f"e0 AS (SELECT * FROM e0f)")
    for i in range(k):
        ctes.append(
            f"""p{i} AS (
              SELECT pair FROM (
                SELECT unnest(list_filter(list_transform(
                         range(1, greatest(len(s), 1)),
                         j -> s[j] || ' ' || s[j+1]),
                       q -> NOT starts_with(q, '{SEP} ')
                            AND NOT ends_with(q, ' {SEP}'))) AS pair
                FROM (SELECT string_split(trim(enc), '  ') AS s FROM e{i})
              ) GROUP BY pair ORDER BY count(*) DESC, pair LIMIT 1
            )"""
        )
        ctes.append(
            f"""e{i + 1} AS (
              SELECT {id_col},
                     replace(enc,
                             ' ' || replace(p{i}.pair, ' ', '  ') || ' ',
                             ' ' || replace(p{i}.pair, ' ', '') || ' ') AS enc
              FROM e{i} CROSS JOIN p{i}
            )"""
        )
    # application: fold every learned merge into the FULL table's
    # encoding (the p{i} one-row frames cross in as scalar params)
    expr = "e0f.enc"
    for i in range(k):
        expr = (
            f"replace({expr}, ' ' || replace(p{i}.pair, ' ', '  ') || ' ',"
            f" ' ' || replace(p{i}.pair, ' ', '') || ' ')"
        )
    crosses = " ".join(f"CROSS JOIN p{i}" for i in range(k))
    ctes.append(
        f"""ap AS (
          SELECT e0f.{id_col}, {expr} AS enc FROM e0f {crosses}
        )"""
    )
    body = ",\n".join(ctes)
    return f"""WITH {body}
        SELECT {id_col},
               CAST(len(list_filter(string_split(trim(enc), '  '),
                        s -> s <> '{SEP}' AND s <> '')) AS BIGINT) AS n_pieces,
               md5(enc) AS enc_md5
        FROM ap"""
