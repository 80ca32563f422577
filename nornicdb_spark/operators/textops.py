"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All pure JVM column expressions (no UDFs) — these run over every document
of a 100 TB corpus, so each is a single projection inside whole-stage
codegen; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from nornicdb_spark.operators.localframe import literal_df

# tiny per-language stopword profiles for the n-gram/stopword-overlap
# language heuristic (deliberately small — it's a cheap first-pass filter)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _words(text_col) -> F.Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: F.length(w) > 0)


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_ws_tokens, n_bpe_ish, avg_token_len).

    n_ws_tokens: whitespace tokens; n_bpe_ish: matches of a BPE-ish regex
    (letter runs / single digits / single punctuation) — a deterministic
    stand-in for a real tokenizer's token count."""
    w = _words(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(w).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_ish"),
        F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast(
            "double"
        ).alias("total_token_chars"),
    ).withColumn(
        "avg_token_len",
        F.when(
            F.col("n_ws_tokens") > 0, F.col("total_token_chars") / F.col("n_ws_tokens")
        ).otherwise(F.lit(0.0)),
    ).drop("total_token_chars")


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality metrics: (doc_id, alpha_ratio, digit_ratio,
    punct_ratio, stopword_ratio, quality) — quality is a fixed convex
    combination, the classic cheap pre-filter before expensive dedup."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha = n - F.length(F.regexp_replace(t, r"[A-Za-z]", "")).cast("double")
    digit = n - F.length(F.regexp_replace(t, r"[0-9]", "")).cast("double")
    punct = n - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", "")).cast("double")
    w = _words(t)
    stop = F.size(F.filter(w, lambda x: x.isin(*LANG_PROFILES["en"]))).cast("double")
    ntok = F.size(w).cast("double")
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        (alpha / n).alias("alpha_ratio"),
        (digit / n).alias("digit_ratio"),
        (punct / n).alias("punct_ratio"),
        F.when(ntok > 0, stop / ntok).otherwise(0.0).alias("stopword_ratio"),
    )
    quality = (
        0.5 * F.col("alpha_ratio")
        + 0.3 * (1 - F.col("punct_ratio"))
        + 0.2 * F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
    )
    return out.withColumn("quality", quality)


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-overlap language heuristic: score(lang) = fraction of
    tokens in the language's profile; winner = max score, ties broken by
    language code. Returns (doc_id, lang_pred, lang_score)."""
    w = _words(F.col(text_col))
    ntok = F.size(w).cast("double")
    scores = [
        (
            lang,
            F.when(
                ntok > 0,
                F.size(F.filter(w, lambda x: x.isin(*prof))).cast("double") / ntok,
            ).otherwise(0.0),
        )
        for lang, prof in sorted(LANG_PROFILES.items())
    ]
    # argmax via greatest + chained when (ties → first in sorted lang order)
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit(None).cast("string")
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        best.alias("lang_score"),
    )


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase text
    — stable under reflow/case changes. Returns (doc_id, fingerprint)."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.md5(normalized).alias("fingerprint")
    )


def repetition_ratios(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals, all codegen'd column expressions:
    (doc_id, dup_word_ratio, dup_bigram_ratio, top_bigram_frac).

    dup_*_ratio = 1 − |distinct|/|all|; top_bigram_frac = multiplicity of
    the most frequent bigram / bigram count (run-length over the sorted
    bigram array via ``aggregate`` — no explode, no shuffle)."""
    bigrams = F.expr(
        f"transform(slice({_W_SQL}, 1, greatest(size({_W_SQL}) - 1, 0)), "
        f"(x, i) -> concat(x, ' ', element_at({_W_SQL}, i + 2)))"
    )
    docs = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .withColumn("_w", _words(F.col("_t")))
        .withColumn("_b", F.array_sort(bigrams))
    )
    nb = F.size("_b").cast("double")
    # longest run in the sorted bigram array = top bigram multiplicity
    run = F.aggregate(
        F.col("_b"),
        F.struct(
            F.lit("").alias("cur"), F.lit(0).alias("n"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("cur"),
            F.when(x == acc.cur, acc.n + 1).otherwise(F.lit(1)).alias("n"),
            F.greatest(
                acc.best, F.when(x == acc.cur, acc.n + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return docs.select(
        "doc_id",
        F.when(F.size("_w") > 0, 1 - F.size(F.array_distinct("_w")) / F.size("_w").cast("double"))
        .otherwise(0.0).alias("dup_word_ratio"),
        F.when(nb > 0, 1 - F.size(F.array_distinct("_b")) / nb)
        .otherwise(0.0).alias("dup_bigram_ratio"),
        F.when(nb > 0, run / nb).otherwise(0.0).alias("top_bigram_frac"),
    )


# SQL-text twin of _words() for expressions that must reference the word
# array more than once inside expr() lambdas
_W_SQL = "filter(split(lower(_t), '\\\\s+'), x -> length(x) > 0)"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction pass: replace emails / dashed phone numbers with
    placeholders, report match counts. Patterns are deliberately
    RE2-compatible so the DuckDB oracle applies the identical regexes.
    Returns (doc_id, n_emails, n_phones, scrubbed)."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(email), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(phone), 0)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("scrubbed"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 50,
    stride: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping word-window chunks — the
    standard pre-embedding step of a training/RAG pipeline. Chunk i
    covers words [i·stride, i·stride + chunk_tokens); the last window
    starting before the end is kept even if short. Pure
    transform+posexplode (narrow, no shuffle): at 100 TB this is a
    map-only job. Returns (doc_id, chunk_no, n_tokens, chunk)."""
    w = _words(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            (F.size(w) - 1) - ((F.size(w) - 1) % stride), F.lit(0)
        ),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.slice(w, s + 1, chunk_tokens)
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_no", "toks"),
    )
    return out.filter(F.size("toks") > 0).select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_join("toks", " ").alias("chunk"),
    )


def contamination_overlap(
    docs: DataFrame,
    probe: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: for every corpus doc, the number of
    distinct word n-grams it shares with a probe (evaluation) set — the
    decontamination primitive of LLM training pipelines. Shape: distinct
    (doc, gram) tables on both sides, equi-join on the gram, count — one
    shuffle each side, no cross join; hub grams are naturally bounded by
    the probe's size. Returns (doc_id, n_shared) for docs with ≥1 hit."""

    def grams(d):
        w = _words(F.col(text_col))
        g = F.expr(
            f"transform(slice({_W_SQL}, 1, greatest(size({_W_SQL}) - {n - 1}, 0)), "
            f"(x, i) -> array_join(slice({_W_SQL}, i + 1, {n}), ' '))"
        )
        return (
            d.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
            .select("doc_id", F.explode(g).alias("gram"))
            .distinct()
        )

    return (
        grams(docs)
        .join(grams(probe).select("gram").distinct(), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def vocab_top_words(
    docs: DataFrame, k: int = 100, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary induction: the k most frequent words with
    counts, ties by word — the seed step of tokenizer training. One
    explode + map-side-combined groupBy, then a global top-k
    (TakeOrderedAndProject). Returns (word, freq)."""
    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(k)
    )


def bpe_pair_counts(
    docs: DataFrame, k: int = 100, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The first BPE merge iteration over the corpus: frequencies of
    ADJACENT symbol pairs within whitespace words (at iteration 0 the
    symbols are single characters), the statistic tokenizer training
    computes once per merge round. Entirely codegen'd — explode words,
    generate each word's pairs with a sequence/transform (no Python),
    map-side-combined count, global top-k (ties by pair). Returns
    (pair, freq) with the pair as 'a b'. At 100 TB this is the same
    shape as vocab induction: one wide explode into a combinable
    aggregate — no shuffle carries raw text."""
    word = F.col("word")
    pairs = F.transform(
        F.sequence(F.lit(1), F.length(word) - 1),
        lambda i: F.concat(
            word.substr(i, F.lit(1)), F.lit(" "), word.substr(i + 1, F.lit(1))
        ),
    )
    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.length(word) >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(k)
    )


# Symbol separator for the BPE state representation — a control char
# that whitespace-split lowercase text never contains. Each symbol is
# wrapped in its own separators ("\x01h\x01\x01e\x01…"), so a merge is
# ONE literal string replace: the pattern \x01a\x01\x01b\x01 can only
# match at symbol boundaries, and sequential non-overlapping replace
# (Spark StringReplace == DuckDB replace()) IS the canonical greedy
# left-to-right BPE merge ("aaa" + (a,a) → [aa, a]; "abab" + (a,b) →
# [ab, ab]).
BPE_SEP = "\x01"


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BPE tokenizer training over the corpus: ``n_merges`` actual merge
    ROUNDS (argmax pair → apply → recount), not just iteration-0 pair
    statistics (:func:`bpe_pair_counts`). The learned artifact — the
    ordered merge table (merge_round, lhs, rhs, freq) — is what a
    tokenizer trainer ships (Sennrich et al. 2016 learn_bpe; reference
    has no tokenizer training — this is the LLM-pipeline extension).

    Distributed shape for 100 TB: the corpus is touched ONCE (word
    histogram: explode + map-side-combined count); every round then
    runs over the DISTINCT-WORD table (vocabulary-sized, corpus-size
    independent) — one weighted pair aggregation + a 1-row argmax
    collect per round (the merge rule is driver-resident learned state,
    the centroid posture), one narrow per-row string replace. State is
    rolled with localCheckpoint per round (the engine's loop idiom) so
    the plan does not grow. Pair counting weights by word frequency and
    counts every adjacent position (overlaps included), matching
    canonical get_stats; argmax ties break (freq desc, lhs asc,
    rhs asc) on both engine and oracle."""
    from nornicdb_spark.operators.scope import CkptScope

    sep = BPE_SEP
    sc = CkptScope()
    words = (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        # a word containing the separator control char would corrupt the
        # wrapped encoding — excluded on BOTH engine and oracle sides
        # (control chars are not trainable text)
        .filter(~F.col("word").contains(sep))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wfreq"))
    )
    wrapped = F.regexp_replace(F.col("word"), "(.)", f"{sep}$1{sep}")
    state = sc.ckpt(words.select("wfreq", wrapped.alias("w")))
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, int(n_merges) + 1):
        syms = F.split(
            F.expr("substring(w, 2, length(w) - 2)"), sep + sep
        )
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("lhs"),
                F.element_at(syms, i + 1).alias("rhs"),
            ),
        )
        best = (
            state.filter(F.size(syms) >= 2)
            .select("wfreq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("wfreq").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # vocabulary exhausted before n_merges rounds
        lhs, rhs, freq = best[0].lhs, best[0].rhs, int(best[0].freq)
        merges.append((rnd, lhs, rhs, freq))
        pat = f"{sep}{lhs}{sep}{sep}{rhs}{sep}"
        rep = f"{sep}{lhs}{rhs}{sep}"
        state = sc.roll(
            state,
            state.select(
                "wfreq", F.replace(F.col("w"), F.lit(pat), F.lit(rep)).alias("w")
            ),
        )
    out = literal_df(docs.sparkSession, 
        merges, "merge_round int, lhs string, rhs string, freq long"
    )
    return sc.finish(out)


def bpe_encode(
    docs: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a TRAINED merge table — the encode half
    of BPE (:func:`bpe_merges` is the train half): each whitespace
    word is char-wrapped into the same ``BPE_SEP`` encoding and every
    merge is applied IN ORDER as one literal replace (greedy
    left-to-right, identical to training's apply step), then the word
    splits into its final symbols. ``merges``: the (merge_round, lhs,
    rhs, …) DataFrame from :func:`bpe_merges`, or an ordered
    [(lhs, rhs), …] list. Entirely codegen'd — the merge chain is
    n_merges nested string replaces, no Python in the row path.
    Returns (doc_id, tokens array<string>)."""
    if isinstance(merges, DataFrame):
        merges = [
            (r.lhs, r.rhs) for r in merges.orderBy("merge_round").collect()
        ]
    sep = BPE_SEP
    w = F.regexp_replace(F.col("word"), "(.)", f"{sep}$1{sep}")
    for lhs, rhs in merges:
        w = F.replace(
            w,
            F.lit(f"{sep}{lhs}{sep}{sep}{rhs}{sep}"),
            F.lit(f"{sep}{lhs}{rhs}{sep}"),
        )
    syms = F.split(F.expr("substring(_w, 2, length(_w) - 2)"), sep + sep)
    # posexplode + sorted reassembly: collect_list is partition-order
    # nondeterministic, so word position travels with each word's
    # symbols and the per-doc token stream is rebuilt in text order
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(_words(F.col(text_col))).alias("pos", "word"),
        )
        # same separator-char exclusion as training (both oracle sides)
        .filter(~F.col("word").contains(sep))
        .withColumn("_w", w)
        .select("doc_id", F.struct("pos", syms.alias("toks")).alias("_pt"))
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list("_pt")), lambda s: s["toks"]
                )
            ).alias("tokens")
        )
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheap perplexity proxy used to rank documents by
    "typicality" before expensive model-based filtering. Two passes:
    build the frequency table, then score (join on word + per-doc avg).
    Returns (doc_id, n_tokens, mean_logprob)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    )
    freq = toks.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    total = freq.agg(F.sum("wc").alias("total"))
    return (
        toks.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # rounded: avg-of-logs is partition-order sensitive at the ULP
            F.round(
                F.avg(F.log(F.col("wc") / F.col("total"))), 9
            ).alias("mean_logprob"),
        )
    )


def split_assign(
    docs: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by salted id hash —
    reproducible across runs and repartitionings (no rand()), disjoint
    from the sampling hash via the salt. Returns (doc_id, bucket, split)."""
    from nornicdb_spark.operators.dedup import h60

    bucket = h60(F.concat(F.lit("split:"), F.col(id_col).cast("string"))) % 100
    return docs.select(
        F.col(id_col).alias("doc_id"), bucket.alias("bucket")
    ).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def corpus_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.45,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """End-to-end training-corpus cleaning: quality floor + language
    allowlist + exact-duplicate removal (per content hash only the min-id
    doc survives) — the standard first pass of an LLM data pipeline,
    composed entirely of codegen'd column expressions (no Python in the
    hot path). Returns (doc_id, lang_pred, quality) for survivors.

    Scale: two narrow joins on doc_id plus one groupBy on the content
    hash; every stage partial-aggregates before its shuffle.
    """
    qs = quality_scores(docs, id_col, text_col).select("doc_id", "quality")
    li = language_id(docs, id_col, text_col).select("doc_id", "lang_pred")
    keepers = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias("doc_id"))
        .select("doc_id")
    )
    return (
        qs.join(li, "doc_id")
        .join(keepers, "doc_id", "left_semi")
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("lang_pred").isin(list(langs))
        )
        .select("doc_id", "lang_pred", "quality")
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    default_rate: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic stratified sampling by predicted language: keep a
    doc iff ``h60(doc_id) % 100 < rate[lang]`` (rates in percent).
    Hash-mod sampling instead of ``rand()`` so the sample is reproducible
    run-to-run, oracle-checkable, and stable under repartitioning — the
    properties a training-data pipeline needs from a sample. Returns
    (doc_id, lang_pred, bucket).
    """
    from nornicdb_spark.operators.dedup import h60

    rates = rates or {"en": 10}
    li = language_id(docs, id_col, text_col).select("doc_id", "lang_pred")
    bucket = h60(F.col("doc_id").cast("string")) % 100
    rate = F.lit(default_rate)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang_pred") == lang, F.lit(r)).otherwise(rate)
    return (
        li.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang_pred", "bucket")
    )


def pack_sequences(
    docs: DataFrame,
    context_tokens: int = 2048,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for training batches: assign documents, in
    deterministic id order within each pack group, to consecutive
    context-window bins — bin = ⌊running-token-total-before-doc / ctx⌋
    (contiguous greedy fill; a doc that straddles a boundary belongs to
    the bin it started in). Grouping by ``group_col`` (e.g. language)
    keeps the running sum PARTITIONED — the window shuffles one group per
    task, so the op scales with groups rather than forcing a global
    total order. Returns per-bin stats:
    (group, bin, n_docs, total_tokens, fill_ratio)."""
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    binned = toks.withColumn(
        "bin", F.floor(before / F.lit(context_tokens)).cast("long")
    )
    return binned.groupBy("group", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum("n_tokens") / F.lit(float(context_tokens)), 9
        ).alias("fill_ratio"),
    )


def temperature_resample(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual/domain-mix
    data recipe (sample source s with relative frequency ∝ n_s^alpha,
    alpha<1 flattens the distribution toward small sources). Expressed as
    downsampling-only per-source keep rates

        rate_s = (n_min / n_s)^(1-alpha)

    so kept_s ∝ n_s^alpha with the smallest source kept whole. The form
    deliberately avoids a Σ n_s^alpha normalizer: min() of integers is
    exact on any engine and any partition order, so the acceptance
    boundary is bit-stable (a float sum would make floor(rate·10⁴) flip
    on ULP noise). Acceptance is hash-mod (h60(doc_id) % 10⁴ < rate·10⁴)
    — deterministic, repartition-stable, oracle-checkable, same contract
    as :func:`stratified_sample`. Returns (source, n_docs, n_kept, rate).
    """
    from nornicdb_spark.operators.dedup import h60

    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_min = F.broadcast(counts.agg(F.min("n_docs").alias("n_min")))
    rates = counts.crossJoin(n_min).withColumn(
        "rate",
        F.pow(F.col("n_min") / F.col("n_docs"), F.lit(1.0 - alpha)),
    )
    kept = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
        .join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(
            # The pow() rate is rounded to 9 decimals BEFORE the floor so the
            # acceptance boundary is ULP-insensitive: libm pow is not
            # correctly rounded, and a raw rate within 1 ULP of an
            # integer/10⁴ boundary would flip floor() between the JVM and
            # the oracle. 9 decimals matches the output convention.
            h60(F.col("doc_id").cast("string")) % 10000
            < F.floor(F.round(F.col("rate"), 9) * 10000)
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left_outer")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.round(F.col("rate") + 1e-12, 9).alias("rate"),
        )
    )


def mixture_plan(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Source mixing plan for a training run: per-source token counts,
    temperature-flattened mixture weights w_s = n_tok_s^alpha / Σ n_tok^alpha,
    and the implied epochs-per-source when the run consumes one full
    corpus-size of tokens (epochs_s = w_s · T / n_tok_s > 1 means the
    source is repeated, < 1 means subsampled — the standard data-recipe
    summary). One narrow groupBy + a broadcast 1-row normalizer; scales
    as a pure aggregate. Returns (source, n_docs, n_tokens, weight,
    epochs), floats 9-rounded."""
    toks = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_words(F.col(text_col)))).cast("long").alias("n_tokens"),
    )
    z = F.broadcast(
        toks.agg(
            F.sum(F.pow(F.col("n_tokens"), F.lit(alpha))).alias("z"),
            F.sum("n_tokens").alias("t_total"),
        )
    )
    return (
        toks.crossJoin(z)
        .withColumn("weight", F.pow(F.col("n_tokens"), F.lit(alpha)) / F.col("z"))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("weight") + 1e-12, 9).alias("weight"),
            F.round(
                F.col("weight") * F.col("t_total") / F.col("n_tokens") + 1e-12, 9
            ).alias("epochs"),
        )
    )


def split_contamination(
    docs: DataFrame,
    n: int = 4,
    train_pct: int = 80,
    val_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split leakage gate: distinct word n-grams each TEST doc
    shares with the TRAIN split under the deterministic
    :func:`split_assign` partition — the held-out-integrity check a
    pipeline runs before publishing a split (test docs leaking training
    n-grams inflate eval scores). Pure composition: split hash + the
    contamination equi-join; no new shuffle shapes. Returns
    (doc_id, n_shared) for test docs with ≥1 shared n-gram."""
    sp = split_assign(docs, train_pct, val_pct, id_col)
    d = docs.join(sp.select(F.col("doc_id").alias(id_col), "split"), id_col)
    return contamination_overlap(
        d.filter(F.col("split") == "test"),
        d.filter(F.col("split") == "train"),
        n=n,
        id_col=id_col,
        text_col=text_col,
    )


def dup_spans(
    docs: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level exact-substring dedup (the ExactSubstr method of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better",
    at word-token granularity): every maximal token span whose
    ``min_len``-token windows each occur >= 2 times anywhere in the
    corpus (other docs or repeats inside the same doc). Doc-level dedup
    (exact/MinHash/SimHash) misses boilerplate embedded in otherwise
    unique documents; this is the operator that finds it. Returns
    (doc_id, span_start, span_len, n_windows) — span_start is the 0-based
    token offset; duplicated windows whose starts are <= min_len apart
    merge into one span.

    Scale shape: the corpus-wide occurrence count groups on the 64-bit
    window hash (partial-aggregating groupBy — the raw gram text never
    shuffles), a semi-join marks duplicated positions, and the span merge
    is one lag/sum window per doc partition (bounded by doc length). A
    2^-64 hash collision could mark a unique window duplicated —
    negligible at corpus scale, and the DuckDB oracle joins on raw grams,
    so systematic divergence would be caught. Reference parity: NornicDB
    ships doc-level dedup only (pkg/dedup); this covers the span-level
    variant from the public paper.
    """
    from pyspark.sql import Window

    L = min_len
    g = F.expr(
        f"transform(slice({_W_SQL}, 1, greatest(size({_W_SQL}) - {L - 1}, 0)), "
        f"(x, i) -> array_join(slice({_W_SQL}, i + 1, {L}), ' '))"
    )
    pos = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .select("doc_id", F.posexplode(g).alias("pos", "gram"))
        .select("doc_id", "pos", F.xxhash64("gram").alias("gh"))
    )
    dup = (
        pos.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gh")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        pos.join(dup, "gh", "left_semi")
        .withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(w) <= L, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("grp", F.sum("brk").over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + L - F.min("pos")).cast("long").alias("span_len"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_len", "n_windows")
    )


def bigram_logprob(
    docs: DataFrame,
    lam: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    trained on the corpus itself — the CCNet-style LM-perplexity quality
    proxy, one model order above :func:`unigram_logprob`:

        p(w2 | w1) = lam * c(w1 w2)/c(w1) + (1 - lam) * c(w2)/total

    Returns (doc_id, n_bigrams, mean_logprob); docs with < 2 tokens have
    no bigram positions and drop. c(w1) counts every occurrence of w1
    (including doc-final positions), the simplest interpolation
    denominator — this is a ranking proxy, not a normalized LM.

    Scale shape: bigram and unigram counts are combinable aggregates; the
    score pass is two shuffle equi-joins on (w1, w2) and the word plus a
    broadcast of the 1-row total — no Python, no cross join, partial
    aggregation everywhere. Positions collapse to per-document DISTINCT
    bigrams before any join (identical (w1, w2) positions in one doc
    contribute the same log p, so the mean over positions equals the
    count-weighted mean over distinct bigrams): every join and the global
    bigram count then run over the ~Zipf-smaller (doc, w1, w2) table
    instead of the raw position stream, which the old shape shuffled
    three times on three different keys.
    """
    pairs = F.expr(
        f"transform(slice({_W_SQL}, 1, greatest(size({_W_SQL}) - 1, 0)), "
        f"(x, i) -> struct(x AS w1, element_at({_W_SQL}, i + 2) AS w2))"
    )
    pr = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # per-doc distinct bigrams with their position counts — the ONLY
    # aggregation that reads the raw position stream
    prdoc = pr.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("c12d")
    )
    uni = (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    # global bigram counts fold out of the per-doc table — no second
    # pass over positions
    big = prdoc.groupBy("w1", "w2").agg(
        F.sum("c12d").cast("double").alias("c12")
    )
    total = uni.agg(F.sum("c").alias("total"))
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    logp = F.log(
        F.lit(lam) * F.col("c12") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("c2") / F.col("total")
    )
    return (
        prdoc.join(big, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c12d").cast("long").alias("n_bigrams"),
            # rounded: log sums are partition-order sensitive at the ULP
            F.round(
                (F.sum(F.col("c12d") * logp) / F.sum("c12d")), 9
            ).alias("mean_logprob"),
        )
    )


def mask_dup_spans(
    docs: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The action half of :func:`dup_spans` — rewrite each document with
    its corpus-duplicated spans REMOVED (what the Lee et al. 2022
    pipeline actually does to the training set after finding spans).
    Returns (doc_id, clean_text, n_removed): clean_text is the
    surviving token stream rejoined with single spaces (tokenization
    normalizes whitespace/case — this is a training-corpus transform,
    not a byte-faithful edit), n_removed the count of dropped tokens.
    Docs with no duplicated span pass through with n_removed = 0.

    Scale shape: dup_spans' shuffles plus one broadcast-friendly
    left join of (doc_id, spans[]) back to the corpus — span lists are
    tiny (only docs WITH duplicates have rows) — and the mask itself is
    a per-row codegen filter over the token array with its index; no
    Python, no extra shuffle beyond the span aggregation."""
    spans = (
        dup_spans(docs, min_len=min_len, id_col=id_col, text_col=text_col)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    (F.col("span_start") + F.col("span_len") - 1).alias("e"),
                )
            ).alias("_spans")
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).join(spans, "doc_id", "left")
    # position-tagged tokens; keep those outside every span
    tagged = F.expr(
        f"transform({_W_SQL}, (x, i) -> struct(x AS tok, i AS pos))"
    )
    filtered = F.filter(
        tagged,
        lambda p: ~F.exists(
            F.col("_spans"), lambda s: (p.pos >= s.s) & (p.pos <= s.e)
        ),
    )
    # span-free docs carry a NULL span list — pass their tokens through
    kept = F.when(F.col("_spans").isNull(), tagged).otherwise(filtered)
    return base.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda p: p.tok), " ").alias(
            "clean_text"
        ),
        (F.size(tagged) - F.size(kept)).cast("long").alias("n_removed"),
    )


def tfidf_vectors(
    docs: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashed TF-IDF document vectors (the hashing trick of
    Weinberger et al. 2009): every word hashes to dim =
    h60('tfidf:' + word) % k (the dedup family's md5 convention, so the
    DuckDB oracle regenerates identical dims), contributing
    tf * ln((N+1)/(df+1)) to that dim; collisions sum (unsigned variant
    — bias is acceptable for similarity ranking and keeps the oracle a
    pure sum). Gives every document a dense k-dim vector WITHOUT a
    model — the bridge from the text family to the vector family
    (cosine top-k, knn join, RP, IVF all apply downstream).
    Returns (doc_id, vec array<double>), components rounded to 9
    (collision sums are order-sensitive at the ULP).

    Scale shape: tf and df are combinable groupBys (vocabulary-sized
    after map-side combine), the corpus size N broadcasts as one row,
    and densification is one groupBy(doc) building a k-entry map —
    every stage linear in token count, nothing quadratic."""
    from nornicdb_spark.operators.dedup import h60

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # dim is a function of the WORD alone — hash once per vocabulary
    # entry here instead of one md5 per (doc, word) row in the contrib
    # projection (|tf| / |vocab| hashes saved; the md5 inside h60 is the
    # single most expensive scalar in this pipeline)
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df")).withColumn(
        "dim", h60(F.concat(F.lit("tfidf:"), F.col("word"))) % F.lit(int(k))
    )
    n_docs = docs.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    contrib = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "dim",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("val"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.round(F.sum("val"), 9).alias("val"))
    )
    dense = contrib.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("dim").cast("int"), F.col("val")))
        ).alias("_m")
    )
    fill = F.transform(
        F.sequence(F.lit(0), F.lit(int(k) - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0.0)),
    )
    return dense.select("doc_id", fill.alias("vec"))


def weighted_sample(
    docs: DataFrame,
    n: int,
    weight_col,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the A-Res
    scheme of Efraimidis & Spirakis 2006): each row draws key =
    u^(1/w) with u a hash-derived uniform in (0, 1], and the n largest
    keys win — inclusion probability proportional to weight, no
    replacement, and (unlike rand()-based sampling) reproducible
    across runs, retries, and repartitionings. ``weight_col`` may be a
    column name or Column expression; rows with weight <= 0 are
    excluded. Returns (doc_id, weight, key) for the n winners, key
    rounded to 9 (selection uses the rounded key + id tie-break so the
    DuckDB oracle's libm cannot flip a boundary membership).

    Scale shape: one narrow projection then a TakeOrderedAndProject —
    every executor keeps n candidates, the driver merges; no shuffle
    of the corpus, no per-group state. The standard way to cut a
    quality- or length-weighted training subset from 10^10 docs in
    one pass."""
    from nornicdb_spark.operators.dedup import h60

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # h60 is uniform on [0, 2^60): (h60 + 1) / 2^60 is uniform on (0, 1]
    u = (
        h60(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) + 1.0
    ) / float(1 << 60)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), w.cast("double").alias("weight")
        )
        .filter(F.col("weight") > 0)
        .withColumn(
            "key", F.round(F.pow(u, 1.0 / F.col("weight")), 9)
        )
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(int(n))
    )


def weighted_sample_per_group(
    docs: DataFrame,
    n_per_group: int,
    weight_col,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stratified form of :func:`weighted_sample`: the A-Res key ranks
    WITHIN each group (one window, no global TakeOrdered), so every
    group keeps its own ``n_per_group`` weighted winners — the
    per-source quota cut of a training-data pipeline (sample k docs
    per domain, weight by quality/length) in one pass. Same
    determinism contract; returns (group, doc_id, weight, key)."""
    from pyspark.sql import Window as W

    from nornicdb_spark.operators.dedup import h60

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        h60(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) + 1.0
    ) / float(1 << 60)
    win = W.partitionBy(group_col).orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        docs.select(
            F.col(group_col).alias(group_col),
            F.col(id_col).alias("doc_id"),
            w.cast("double").alias("weight"),
        )
        .filter(F.col("weight") > 0)
        .withColumn("key", F.round(F.pow(u, 1.0 / F.col("weight")), 9))
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= int(n_per_group))
        .select(group_col, "doc_id", "weight", "key")
    )
