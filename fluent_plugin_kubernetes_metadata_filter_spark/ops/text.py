"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All expression-only (whole-stage codegen); the
BPE-ish tokenizer uses one regex, not a Python loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Tiny per-language stopword profiles for the n-gram-free heuristic.
# SINGLE SOURCE OF TRUTH: the DuckDB oracle rebuilds its argmax SQL
# from this dict, so adding a language here extends BOTH engines in
# lockstep (dict order = tie-break precedence: earlier wins).
# Overlapping words across profiles (es/nl "de", fr/es "la") are fine —
# the argmax counts per-profile hits and ties resolve to the earlier
# profile, so a genuine en/es document never flips to a later language
# on shared stopwords alone. ASCII-only words: tokens are
# lower(trim(split \s+)) and the sandbox corpus is ASCII-verified.
LANG_PROFILES = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "una", "de"),
    "it": ("il", "di", "che", "e", "un", "per", "non"),
    "pt": ("o", "do", "da", "que", "em", "um", "uma"),
    "nl": ("de", "het", "een", "en", "van", "op", "niet"),
}
_PROFILES = LANG_PROFILES  # backward-compat internal alias

# GPT-style pre-tokenizer regex (public BPE pattern family): words with
# optional leading space, numbers, punctuation runs.
BPE_ISH = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def tokens(text_col) -> F.Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (regexp-based)."""
    tk = tokens(F.col(text_col))
    bpe = F.array_remove(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0), "")
    return df.withColumns(
        {
            "n_tokens_ws": F.size(tk).cast("bigint"),
            "n_tokens_bpe": F.size(bpe).cast("bigint"),
            "n_chars": F.length(text_col).cast("bigint"),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality: length, punctuation ratio, stopword ratio,
    mean word length, repetition (distinct/total tokens).

    Punctuation and non-space character counts are computed by
    DECOMPOSED positive-class regexp_counts —
    ``length − count([A-Za-z0-9]) − count(\\s)`` — never by a negated
    character class or a replace-and-measure: measured on a 120k-doc
    input, Java regex evaluates ANY negated class (``[^...]``, however
    written) ~10x slower than the equivalent positive classes AND the
    cost stops scaling with cores (6.5-7.4s at 4 and 16 pinned cores
    alike, vs 0.8s decomposed); replace-and-measure additionally
    builds the replaced string per row just to take its length. The
    decomposition is value-identical (each subtraction counts exactly
    the removed characters), which the oracle's independent
    formulation pins. The token array is projected once and shared by
    the token metrics (the non-cheap multi-referenced alias blocks
    CollapseProject from re-inlining the split per metric)."""
    tk = F.col("_qs_tk")
    n = F.size(tk)
    stop = F.size(F.filter(tk, lambda t: t.isin(*_PROFILES["en"])))
    n_alnum = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z0-9]"))
    n_ws = F.col("_qs_nws")
    punct = F.length(text_col) - n_alnum - n_ws
    distinct_ratio = F.size(F.array_distinct(tk)) / n
    df = df.withColumns(
        {
            "_qs_tk": tokens(F.col(text_col)),
            "_qs_nws": F.regexp_count(F.col(text_col), F.lit(r"\s")),
        }
    ).withColumns(
        {
            "punct_ratio": punct / F.length(text_col),
            "stopword_ratio": stop / n,
            "mean_word_len": (F.length(text_col) - n_ws) / n,
            "distinct_token_ratio": distinct_ratio,
        }
    ).drop("_qs_tk", "_qs_nws")
    # composite in [0,1]: long enough, some stopwords, not too much
    # punctuation, not degenerate repetition
    score = (
        F.least(F.length(text_col) / 500.0, F.lit(1.0)) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.2
        + F.least(F.col("distinct_token_ratio") * 1.5, F.lit(1.0)) * 0.3
    )
    return df.withColumn("quality_score", score)


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score = hits per profile, argmax
    wins (ties -> 'unk'). One pass, pure expressions.

    Both the token array and the per-language scores are STAGED through
    work columns: inlined, the argmax when-chain references each score
    ~3x (greatest + two when arms) and each score re-splits the text —
    ~3 x n_langs split+filter evaluations per row collapse to one split
    and n_langs filters (non-cheap multi-referenced aliases block
    CollapseProject from re-inlining)."""
    tk = F.col("_li_tk")

    def hit_counter(ws):
        return lambda t: t.isin(*ws)

    scores = {
        lang: F.col(f"_li_s_{lang}") for lang in _PROFILES
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unk")
    # reversed so earlier profiles win exact ties deterministically
    for lang in reversed(list(_PROFILES)):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return (
        df.withColumn("_li_tk", tokens(F.col(text_col)))
        .withColumns(
            {
                f"_li_s_{lang}": F.size(F.filter(tk, hit_counter(ws)))
                for lang, ws in _PROFILES.items()
            }
        )
        .withColumn("lang_pred", pred)
        .drop("_li_tk", *[f"_li_s_{lang}" for lang in _PROFILES])
    )


def fingerprint(df: DataFrame, text_col: str = "text", shingle_k: int = 5) -> DataFrame:
    """Doc fingerprint: md5 of normalized text + a winnowed shingle-hash
    minimum (rolling-hash flavored, expression-only).

    Both the normalized text and its token array are STAGED through
    work columns: inlined, the regexp_replace would evaluate 3x per row
    and the split once per element_at — O(tokens^2) per doc. The
    non-cheap multi-referenced aliases block CollapseProject."""
    norm = F.col("_fp_norm")
    tk = F.col("_fp_tk")
    sh = F.when(
        F.size(tk) >= shingle_k,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (shingle_k - 1)),
            lambda i: F.xxhash64(
                F.concat_ws(" ", *[F.element_at(tk, i + j) for j in range(shingle_k)])
            ),
        ),
    ).otherwise(F.array(F.xxhash64(norm)))
    return (
        df.withColumn(
            "_fp_norm",
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
        )
        .withColumn("_fp_tk", F.split(norm, " "))
        .withColumns(
            {
                "doc_fp": F.md5(norm),
                "min_shingle_hash": F.array_min(sh),
            }
        )
        .drop("_fp_norm", "_fp_tk")
    )


def curate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           min_quality: float = 0.5, langs: tuple[str, ...] = ("en",)) -> DataFrame:
    """Corpus curation: quality gate -> language gate -> exact-dedup
    keeper filter, the standard pre-training funnel as one composed
    operator. Returns the surviving docs with their scores.

    The quality threshold is applied on the 1e-4-floored score — the
    floored grid is what the correctness gate proves bit-equal across
    engines, so the cut cannot straddle a float ulp. The dedup stage is
    the keeper window (one shuffle on the content fingerprint); gates
    run BEFORE it, so the expensive shuffle sees only surviving rows.
    """
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import (
        _content_fingerprint,
    )
    from pyspark.sql import Window

    q = quality_score(langid(token_counts(df, text_col), text_col), text_col)
    q4 = F.floor(F.col("quality_score") * 10000) / 10000
    kept = q.withColumn("q4", q4).where(
        (F.col("q4") >= min_quality) & F.col("lang_pred").isin(*langs)
    )
    w = Window.partitionBy(_content_fingerprint(text_col))
    return (
        kept.withColumn("_k0", F.min(F.col(id_col)).over(w))
        .where(F.col(id_col) == F.col("_k0"))
        .select(id_col, "lang_pred", "q4", "n_tokens_ws")
    )


def pinned_prefix_sum(d: DataFrame, order_cols: list, value_col: str,
                      cum_col: str = "cum") -> DataFrame:
    """Exact GLOBAL running sum of ``value_col`` over the total order
    ``order_cols``, distributed — the primitive behind token-budget
    selection and sequence packing.

    Two phases instead of a global-order window (which Spark executes
    in ONE partition): range-repartition on the sort key so partitions
    are globally ordered, collect each partition's subtotal (a tiny
    driver-side map, O(#partitions)), then a per-partition cumulative
    window offset by the preceding partitions' subtotals. Every stage
    is distributed; the only driver-side state is one number per
    partition.

    The subtotal job and the output job MUST see the same physical
    partitioning. ``repartitionByRange`` re-samples boundary values per
    execution (its contract says output "may not be consistent"), and
    AQE may coalesce partitions differently per run, so the partitioned
    frame is materialized once with ``localCheckpoint`` before either
    job reads it — this also makes everything upstream of ``d`` execute
    exactly once. A pid that somehow misses the offset map raises
    rather than yielding NULL. localCheckpoint loss (executor death)
    fails the job loudly — never silently wrong.

    ``order_cols`` must be a TOTAL order (include a unique tiebreaker)
    or per-row cum values within a tie group are arbitrary."""
    from pyspark.sql import Window

    nparts = d.sparkSession.sparkContext.defaultParallelism
    # ``repartitionByRange`` SAMPLES its input to pick boundaries
    # (RangePartitioner.sketch), then reads it again for the shuffle —
    # and each read executes everything upstream of ``d``: for
    # token_budget that is the whole scoring DAG, for full_curation the
    # scoring + three gate semi-joins, all TWICE. Stage the narrow
    # (order, value) rows once so the sample pass and the shuffle both
    # read materialized rows (round 7; the input here is always
    # id + sort key + value — a few dozen bytes/row, never the text).
    d = d.localCheckpoint(eager=False)
    d = d.repartitionByRange(nparts, *order_cols)
    d = d.withColumn("_pid", F.spark_partition_id())
    d = d.localCheckpoint(eager=True)
    # O(#partitions) driver map: each partition's subtotal
    offsets_rows = d.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    totals = {r["_pid"]: r["s"] for r in offsets_rows}
    prefix = {}
    acc = 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    if not prefix:  # empty input: no map to build, nothing to emit.
        # Use the SAME expression shape as the non-empty branch
        # (windowed sum + bigint offset) so the output schema does not
        # depend on whether the input was empty — sum()'s natural type
        # widens int->bigint but keeps double as double.
        w0 = (
            Window.partitionBy("_pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return d.where(F.lit(False)).withColumn(
            cum_col, F.sum(value_col).over(w0) + F.lit(0).cast("bigint")
        ).drop("_pid")
    pmap = F.create_map(
        *[c for pid, off in prefix.items()
          for c in (F.lit(pid), F.lit(off).cast("bigint"))]
    )
    offset = F.coalesce(
        pmap[F.col("_pid")],
        F.raise_error(
            F.concat(
                F.lit("pinned_prefix_sum: partition id not in offset map: "),
                F.col("_pid").cast("string"),
            )
        ).cast("bigint"),
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn(cum_col, F.sum(value_col).over(w) + offset).drop("_pid")


def token_budget(df: DataFrame, budget: int, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Select the best docs until a token budget is exhausted: order by
    (floored quality desc, id asc — a total order), take docs while the
    RUNNING token total stays within ``budget``. The running total is
    the distributed ``pinned_prefix_sum`` (see there for the scale and
    consistency contract)."""
    q = quality_score(token_counts(df, text_col), text_col)
    d = q.select(
        F.col(id_col),
        (F.floor(F.col("quality_score") * 10000) / 10000).alias("q4"),
        F.col("n_tokens_ws").alias("n_tokens"),
    )
    c = pinned_prefix_sum(
        d, [F.desc("q4"), F.asc(id_col)], "n_tokens", cum_col="cum_tokens"
    )
    return (
        c.where(F.col("cum_tokens") <= budget)
        .select(id_col, "q4", "n_tokens", "cum_tokens")
    )


def pack_sequences(df: DataFrame, seq_len: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   shuffle_seed: int | None = None,
                   hash_fn: str = "xxhash64") -> DataFrame:
    """GPT-style concat-and-chunk layout: lay documents end-to-end and
    cut the token stream into fixed ``seq_len`` training sequences.
    Returns per doc its token count, its byte-stream-like
    ``start_offset`` in the global token stream, and ``bin_id`` =
    which training sequence the doc STARTS in (start_offset div
    seq_len) — the assignment a sharded packing writer needs to route
    each doc to its output shard deterministically.

    ``shuffle_seed=None`` packs in id order; setting it packs in a
    DETERMINISTIC shuffled order (sort key = the id unit-hash, id
    tiebreak) — real pretraining packing shuffles document order
    first so a training sequence doesn't stream one domain/crawl-run
    in its source order, and doing it by hash keeps the layout a pure
    function of (ids, seed): reproducible on any cluster size, no
    global random permutation state. The shuffle costs nothing extra —
    it just swaps the range-partition sort key inside the same
    distributed ``pinned_prefix_sum``.

    The global offsets come from the distributed ``pinned_prefix_sum``
    over the chosen total order; everything else is arithmetic.
    Deterministic for a given corpus on any cluster size."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import unit_hash

    d = token_counts(df, text_col).select(
        F.col(id_col), F.col("n_tokens_ws").alias("n_tokens")
    )
    if shuffle_seed is None:
        order = [F.asc(id_col)]
    else:
        d = d.withColumn("_u", unit_hash(id_col, shuffle_seed, hash_fn))
        order = [F.asc("_u"), F.asc(id_col)]
    c = pinned_prefix_sum(d, order, "n_tokens", cum_col="_cum")
    if shuffle_seed is not None:
        c = c.drop("_u")
    start = (F.col("_cum") - F.col("n_tokens")).alias("start_offset")
    return c.select(
        id_col,
        "n_tokens",
        start,
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(seq_len))
        .cast("bigint")
        .alias("bin_id"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", ns: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Gopher-style repetition quality signals: for each n in ``ns``,
    the fraction of the doc's word n-grams taken by the single MOST
    FREQUENT n-gram (``top{n}_frac``). Degenerate machine-generated text
    ("buy now buy now buy now ...") scores near 1.0; natural text near
    1/n_tokens. The standard pre-training repetition filter cuts docs
    whose top-2-gram or top-3-gram fraction exceeds a threshold
    (Rae et al. 2021, "Scaling Language Models", table A1 — public).

    A doc shorter than n tokens has no n-grams: its ``top{n}_frac`` is
    0.0 (nothing to repeat).

    Scale shape: computing a per-doc MODE is not expression-friendly
    (an array-lambda formulation is O(tokens^2) interpreted per row),
    so all requested n-gram lengths are tagged and exploded ONCE after
    an explicit repartition on the doc id. That repartition is the
    job's ONLY exchange — and it carries doc-grain rows (raw text),
    not n-gram grain: hash partitioning on id satisfies every
    downstream grouping ((id,n,gram) counts, (id,n) max/total, the
    (id) pivot) because the partitioning key is a subset of each
    grouping key, so all three aggregations run partition-local.
    Without the repartition the same plan costs three exchanges at
    n-gram grain — strictly more bytes than the documents themselves.
    Plan-asserted in tests. No Python, no unbounded buffers.

    The token array is STAGED through a column: an inline tokens()
    expression is duplicated by Catalyst into every element_at in the
    gram lambdas, re-splitting the text per element — O(tokens^2) per
    doc (the non-cheap multi-referenced alias blocks CollapseProject
    from re-inlining it)."""
    tk = F.col("_tk")
    gram_struct = "array<struct<n:int,gram:string>>"

    # one-arg lambda via factory: a 2-param lambda (even with a default)
    # is read by PySpark's HOF binding as (element, index)
    def gram_maker(_n):
        return lambda i: F.struct(
            F.lit(_n).alias("n"),
            F.concat_ws(
                " ", *[F.element_at(tk, i + j) for j in range(_n)]
            ).alias("gram"),
        )

    per_n = []
    for n in ns:
        if n == 1:
            grams = F.transform(tk, lambda t: F.struct(F.lit(1).alias("n"), t.alias("gram")))
        else:
            grams = F.when(
                F.size(tk) >= n,
                F.transform(F.sequence(F.lit(1), F.size(tk) - (n - 1)), gram_maker(n)),
            ).otherwise(F.array().cast(gram_struct))
        per_n.append(grams)
    # one doc-grain exchange buys exchange-free aggregation everywhere
    # below (see docstring); also spreads small scans across cores
    p = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(max(p, df.rdd.getNumPartitions()), id_col)
    g = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col), F.explode(F.flatten(F.array(*per_n))).alias("g")
    ).select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = g.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    fracs = counts.groupBy(id_col, "n").agg(
        (F.max("cnt") / F.sum("cnt")).alias("frac")
    )
    aggs = [
        F.coalesce(
            F.max(F.when(F.col("n") == n, F.col("frac"))), F.lit(0.0)
        ).alias(f"top{n}_frac")
        for n in ns
    ]
    return fracs.groupBy(id_col).agg(*aggs)


# Redaction patterns: Java-regex AND RE2 compatible (no backtracking
# constructs), so the DuckDB oracle replays the identical sequence.
# Order matters — each pattern is counted and replaced against the text
# as left by the previous one (an email's digits must not later count
# as a phone; a card number must be consumed before the generic digit
# run). Dict order IS application order.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "card": r"\b\d{13,19}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               patterns: dict[str, str] | None = None,
               out_col: str = "redacted_text") -> DataFrame:
    """PII scrubbing for training corpora: sequentially replace each
    pattern class with a ``[KIND]`` placeholder and count the matches
    per class (``n_<kind>`` columns). Pure expression chain
    (regexp_count + regexp_replace) — whole-stage codegen, no shuffle,
    no Python; at 100 TB this is a free rider on whatever scan already
    touches the text column.

    Patterns apply in dict order against the progressively redacted
    text, so earlier classes consume characters before later, more
    general ones (the default order: email, ipv4, card, phone)."""
    if patterns is None:
        patterns = PII_PATTERNS
    # stage through a work column so each replace is computed ONCE:
    # chaining expressions instead would embed the whole replace prefix
    # into every n_<kind> column and re-run it per column per row (the
    # non-cheap multi-referenced alias keeps CollapseProject from
    # re-inlining the staged form)
    work = "_pii_work"
    out = df.withColumn(work, F.col(text_col))
    for kind, pat in patterns.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(work), F.lit(pat)).cast("bigint")
        ).withColumn(work, F.regexp_replace(F.col(work), pat, f"[{kind.upper()}]"))
    return out.withColumn(out_col, F.col(work)).drop(work)


def clean_lines(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                min_words: int = 5, require_terminal_punct: bool = True,
                ban_substrings: tuple[str, ...] = ("javascript",),
                min_lines: int = 3,
                page_ban_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
                sep: str = "\n") -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep a
    line only if it has >= ``min_words`` words, ends in terminal
    punctuation (``.!?"``), and contains none of ``ban_substrings``
    (case-insensitive); then flag the whole page as dropped when fewer
    than ``min_lines`` lines survive or the raw text contains a
    ``page_ban_substrings`` marker (the paper's "lorem ipsum" / code-
    brace heuristics).

    Returns ``(id, clean_text, n_kept, n_dropped, keep)`` for every
    input doc. Pure higher-order expressions over the split line array
    — whole-stage codegen, ZERO shuffle, no Python: at 100 TB this is a
    free rider on the corpus scan, unlike the paragraph-grain ops which
    need a reassembly exchange (here reassembly is per-row, so no
    explode ever happens)."""
    lines = F.split(F.col(text_col), sep)

    def line_keep(line):
        c = F.size(F.split(F.trim(line), r"\s+")) >= min_words
        if require_terminal_punct:
            c = c & F.trim(line).rlike('[.!?"]$')
        for b in ban_substrings:
            c = c & ~F.contains(F.lower(line), F.lit(b))
        return c

    kept = F.filter(lines, line_keep)
    page_ok = F.size(kept) >= min_lines
    for p in page_ban_substrings:
        page_ok = page_ok & ~F.contains(F.lower(F.col(text_col)), F.lit(p))
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("bigint").alias("n_dropped"),
        page_ok.alias("keep"),
    )


def lm_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             top_k: int = 50_000, alpha: float = 0.5,
             grid: int = 4) -> DataFrame:
    """Unigram-LM quality score — the shuffle-cheap degenerate form of
    CCNet's KenLM perplexity filter (Wenzek et al. 2020): estimate
    token probabilities from the corpus itself, score each doc by the
    mean negative log-likelihood of its tokens. Natural text full of
    common words scores LOW; gibberish / rare-token soup scores HIGH —
    cut the top tail, or both tails (CCNet keeps the middle).

    Out-of-vocabulary tokens (below the ``top_k`` frequency cut) get
    the smoothed floor probability ``alpha / total``. Scores land on
    the 10^-grid floored grid so an independent engine with a
    different log/avg rounding chain reproduces them exactly.

    Scale shape: ONE count shuffle (map-side combined) builds the
    vocabulary; the top-k cut (TakeOrderedAndProject, ~1 MB at 50k) is
    BROADCAST back against the exploded corpus — deliberately NOT a
    shuffle join, because token frequency is maximally skewed (every
    doc joins on "the"); scoring then needs only the doc-grain
    re-aggregation exchange. The vocabulary is MATERIALIZED
    (localCheckpoint) before the ``total`` collect: without it, the
    full corpus explode + count shuffle executes three times — the
    collect, the broadcast build, and the probe side all re-run the
    lineage (the token_budget double-execution pattern). Checkpointed,
    the corpus is scanned exactly twice (vocab build + scoring probe —
    the probe re-scan is inherent, it is corpus-grain) and the
    broadcast build reads the vocab-grain checkpoint.
    Returns ``(id, lm_nll, n_tokens)``."""
    tk = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    vocab = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(
        eager=False
    )
    total = float(vocab.agg(F.sum("cnt")).collect()[0][0])
    topk = vocab.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_k)
    m = float(10**grid)
    nll = -F.log(F.coalesce(F.col("cnt").cast("double"), F.lit(float(alpha))) / F.lit(total))
    return (
        tk.join(F.broadcast(topk), "tok", "left")
        .groupBy(id_col)
        .agg(
            (F.floor(F.avg(nll) * m) / m).alias("lm_nll"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def lm_score2(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              top_k: int = 50_000, lam: float = 0.8, alpha: float = 0.5,
              grid: int = 4) -> DataFrame:
    """Interpolated BIGRAM-LM quality score — one CCNet fidelity step
    up from `lm_score` (Wenzek et al. 2020 use a trained KenLM; the
    corpus-estimated interpolated bigram is the shuffle-cheap
    self-supervised form): score each doc by the mean NLL of its
    bigram events under ``p(cur|prev) = lam * p_bigram(cur|prev) +
    (1-lam) * p_unigram(cur)``. Word ORDER now matters — a doc that is
    a shuffled bag of common words (which `lm_score` cannot tell from
    natural prose: same token multiset, same score) has rare bigrams
    and scores HIGH, while natural text rides the frequent-transition
    mass. ``tests/test_ops.py::test_lm_score2_order_sensitivity`` pins
    exactly that separation on planted docs.

    Vocabulary cuts: top ``top_k`` unigrams and top ``top_k`` bigrams
    (count desc, token asc ties). The bigram conditional denominator is
    the FULL unigram count of ``prev`` (not the top-k-cut one), so
    p_bigram is a true conditional; unseen/cut bigrams contribute 0 and
    the unigram floor (OOV -> ``alpha/total``) keeps the log finite.
    ``1-lam`` is computed as the IEEE double ``1.0 - lam`` on BOTH
    engines (the oracle writes ``(1 - 0.8)``, not ``0.2`` — the two
    literals differ by one ulp) and scores floor to the 10^-grid.

    Scale shape: THREE corpus passes — unigram vocab build, bigram
    vocab build, scoring probe — the `dsir_weights` doctrine. Both
    vocab tables are top-k bounded and BROADCAST against the exploded
    pair events (token/bigram frequency is maximally skewed: every doc
    joins on "the" / "of the" — a shuffle join would hotspot, exactly
    the `lm_score` rationale). The unigram vocab is localCheckpoint'd
    (vocab-grain) before its three consumers (the ``total`` collect,
    the top-k cut, and the bigram-denominator attach) so the corpus
    explode behind it runs once. Attaching the denominator joins the
    top-k bigram cut (broadcast, ~top_k rows) against the checkpointed
    vocab — never the corpus. Docs with < 2 tokens have no bigram
    events and are ABSENT from the output (document the contract; the
    oracle applies the same filter).
    Returns ``(id, lm_nll2, n_events)`` for every doc with >=2 tokens."""
    tk = F.col("_tk")
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    uni = base.select(F.col(id_col), F.explode(tk).alias("cur"))
    pairs = base.where(F.size(tk) >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(2), F.size(tk)),
                lambda i: F.struct(
                    F.element_at(tk, i - 1).alias("prev"),
                    F.element_at(tk, i).alias("cur"),
                ),
            )
        ).alias("e"),
    ).select(id_col, "e.prev", "e.cur")

    uvoc = uni.groupBy("cur").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(
        eager=False
    )
    total = float(uvoc.agg(F.sum("cnt")).collect()[0][0])
    utop = uvoc.orderBy(F.desc("cnt"), F.asc("cur")).limit(top_k)
    btop = (
        pairs.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("bcnt"))
        .orderBy(F.desc("bcnt"), F.asc("prev"), F.asc("cur"))
        .limit(top_k)
    )
    # true conditional: divide by prev's FULL unigram count (top-k rows
    # join the checkpointed vocab-grain table, corpus untouched)
    btbl = (
        uvoc.select(F.col("cur").alias("prev"), F.col("cnt").alias("pcnt"))
        .join(F.broadcast(btop), "prev")
        .select(
            "prev", "cur",
            (F.col("bcnt").cast("double") / F.col("pcnt")).alias("pbig"),
        )
    )
    m = float(10**grid)
    puni = F.coalesce(F.col("cnt").cast("double"), F.lit(float(alpha))) / F.lit(total)
    phat = (
        F.lit(float(lam)) * F.coalesce(F.col("pbig"), F.lit(0.0))
        + F.lit(1.0 - lam) * puni
    )
    return (
        pairs.join(F.broadcast(btbl), ["prev", "cur"], "left")
        .join(F.broadcast(utop), "cur", "left")
        .groupBy(id_col)
        .agg(
            (F.floor(F.avg(-F.log(phat)) * m) / m).alias("lm_nll2"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", top_k: int = 50_000,
                       lam: float = 0.8, alpha: float = 0.5, grid: int = 4,
                       sample_n: int = 999, seed: int = 17,
                       hash_fn: str = "md5") -> DataFrame:
    """CCNet's head/middle/tail perplexity split (Wenzek et al. 2020):
    bucket every doc by its LM score against the corpus tertiles —
    downstream mixes keep head+middle, or sample tail at a reduced
    rate. Composes `lm_score2` with a DETERMINISTIC sample-based
    threshold: exact corpus-wide percentiles would funnel every score
    into one reducer (a single-group exact percentile is a global
    sort), and approx_percentile is not bit-stable across
    partitionings — instead the tertiles come from the `sample_k`
    primitive (the ``sample_n`` id-hash-smallest docs, a pure function
    of ids and seed), sorted driver-side (O(sample_n)), and applied as
    two literals. Scores are grid-floored, so the threshold compare is
    exact on both engines and the bucket assignment is a property of
    the data — identical on reruns, cluster sizes, and in the SQL
    oracle (which re-derives the same sample by the same md5 hash
    order and indexes the same ceil(n/3) order statistics).

    The scored frame is localCheckpoint'd before the sample collect —
    it feeds two consumers (threshold sample + final bucket pass), and
    without materialization the whole bigram-LM lineage would execute
    twice (the token_budget double-execution pattern).
    Returns ``(id, lm_nll2, bucket)`` for every doc with >=2 tokens."""
    import math

    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import unit_hash

    scored = lm_score2(df, text_col, id_col, top_k, lam, alpha, grid)
    scored = scored.localCheckpoint(eager=False)
    samp = (
        scored.withColumn("_u", unit_hash(id_col, seed, hash_fn))
        .orderBy(F.asc("_u"), F.asc(id_col))
        .limit(sample_n)
    )
    vals = sorted(r.lm_nll2 for r in samp.collect())
    if not vals:
        raise ValueError("perplexity_buckets: no scorable docs (all <2 tokens)")
    n = len(vals)
    t1 = vals[math.ceil(n / 3) - 1]
    t2 = vals[math.ceil(2 * n / 3) - 1]
    return scored.select(
        id_col,
        "lm_nll2",
        F.when(F.col("lm_nll2") <= F.lit(t1), F.lit("head"))
        .when(F.col("lm_nll2") <= F.lit(t2), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def tfidf_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                top_terms: int = 5, grid: int = 4) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: the ``top_terms``
    tokens of each document ranked by ``tf * ln(N / df)`` — the
    standard characteristic-terms primitive behind topic labeling,
    near-duplicate triage, and per-domain vocabulary drift reports.

    Deterministic contract: scores land on the 10^-grid floored grid
    and the per-doc rank orders by (floored score desc, term asc), so
    an independent engine with a different ln rounding chain ranks
    identically. N (corpus doc count) is one O(1) driver action.

    Scale shape, three exchanges — the minimum for the three grains the
    statistic touches: (id, term) for tf, term for document frequency,
    id for the final rank. The df table is VOCABULARY-grain, far too
    large (and too skew-irrelevant: "the" has df ~= N) to broadcast, so
    it joins sort-merge on term where AQE's skew-split applies — a
    deliberate contrast with `lm_score`, whose top-k vocabulary cut
    makes the broadcast legal. The rank window partitions by id
    (bounded by doc length), never by term (unbounded hot partitions —
    windows, unlike joins, cannot be skew-split)."""
    m = float(10**grid)
    n_docs = float(df.select(id_col).distinct().count())
    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.floor(
            F.col("tf") * F.log(F.lit(n_docs) / F.col("df_docs")) * m
        ) / m,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_terms)
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df_docs").cast("bigint").alias("df_docs"),
            "tfidf",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ngram_stats(df: DataFrame, n: int = 2, top_k: int = 100,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide top-k n-gram frequency table: occurrences AND
    document frequency per n-gram — the discovery side of boilerplate
    removal (feed the over-frequent grams to `paragraph_dedup` /
    `clean_lines` ban lists) and the corpus-statistics report behind
    Gopher-style repetition thresholds.

    Scale shape: n-grams build JVM-side (sequence + concat_ws, no
    UDF); the two statistics come from ONE two-level aggregation —
    groupBy (gram, id) with map-side combine collapses within-doc
    repeats first, then groupBy gram sums occurrences and counts rows
    for document frequency — two exchanges, NO count-distinct expand.
    The top-k cut is TakeOrderedAndProject (per-partition heaps, no
    global sort). Ties break (occurrences desc, gram asc) so the cut
    set is deterministic on both engines.

    The token array is STAGED through a column before the gram
    transform: an inline tokens() expression gets duplicated into every
    element_at by Catalyst, re-splitting the text per element —
    O(tokens^2) per doc (the staged alias is non-cheap and
    multi-referenced, which blocks CollapseProject from re-inlining)."""
    tk = F.col("_tk")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(tk, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array())
    per_doc = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy("gram", id_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_doc.groupBy("gram").agg(
        F.sum("c").cast("bigint").alias("occurrences"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return stats.orderBy(F.desc("occurrences"), F.asc("gram")).limit(top_k)
