"""Text analysis operators: token counting, quality scoring, language
identification, document fingerprinting.

All native Catalyst expressions (regexp_extract_all / split /
higher-order functions) — these run per-document over the full corpus,
so they must stay in whole-stage codegen; every formula is also
expressible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# crude-but-deterministic per-language marker words for the n-gram
# heuristic; ASCII-safe so regex semantics agree across engines
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "es"],
}


def token_count_cols(text: Column) -> dict[str, Column]:
    """Whitespace token count + a BPE-ish subword proxy: words,
    single digits, and punctuation as separate matches."""
    ws_tokens = F.size(F.split(F.trim(text), r"\s+"))
    bpe_ish = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)))
    return {
        "n_tokens": ws_tokens.cast("bigint"),
        "n_subword_tokens": bpe_ish.cast("bigint"),
    }


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length / punctuation / letter-ratio quality heuristics; the
    composite score is a deterministic double formula (int ratios)."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_space = F.length(F.regexp_replace(text, r"[^ ]", ""))
    alpha_ratio = n_alpha.cast("double") / n_chars.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    len_score = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.5) * alpha_ratio + F.lit(0.3) * len_score + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
    return {
        "n_chars": n_chars.cast("bigint"),
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "n_spaces": n_space.cast("bigint"),
        "quality_score": score,
    }


def lang_marker_counts(text: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts (word-boundary regex)."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[f"hits_{lang}"] = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0))).cast(
            "bigint"
        )
    return out


def lang_id_col(text: Column) -> Column:
    """argmax of marker hits, 'und' (undetermined) when all zero;
    deterministic tie-break by the LANG_MARKERS declaration order."""
    counts = lang_marker_counts(text)
    best = F.lit("und")
    best_n = F.lit(0).cast("bigint")
    # iterate reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        c = counts[f"hits_{lang}"]
        take = c >= F.greatest(best_n, F.lit(1).cast("bigint"))
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, c).otherwise(best_n)
    return best


def fingerprint_col(text: Column) -> Column:
    """Normalization fingerprint: lowercase, collapse whitespace, md5 —
    the exact-dedup key (P13-adjacent)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def word_bigrams(text) -> "Column":
    """Adjacent word bigrams of lowercased text, via arrays_zip of the
    word array against its own tail (O(len)/row; the transform-over-
    sequence + element_at form re-evaluates the split per element and
    errors on 1-word docs under ANSI — see repetition_stats)."""
    ws = F.split(F.lower(F.trim(text)), r"\s+")
    z = F.arrays_zip(ws.alias("w0"), F.slice(ws, 2, 1 << 30).alias("w1"))
    return F.filter(
        F.transform(
            z,
            lambda s: F.when(
                s["w1"].isNotNull(), F.concat(s["w0"], F.lit(" "), s["w1"])
            ),
        ),
        lambda x: x.isNotNull(),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rules,
    Rae et al. 2021 §A1.1): docs dominated by one word or by repeated
    bigrams are boilerplate/spam and get filtered before training.

    Output: (doc_id, top_word_frac, n_words, dup_bigram_frac) where
    top_word_frac = max word count / total words and dup_bigram_frac =
    1 - distinct bigrams / total bigrams.  All ratios are integer
    divisions in double -> bit-deterministic across engines.

    Scale shape: the word-mode needs a shuffle keyed by (doc, word) —
    partial counts combine map-side, so the wire carries one row per
    distinct (doc, word); the bigram stats are pure array expressions
    in the scan stage (no shuffle).
    """
    lowered = F.lower(F.trim(F.col(text_col)))
    words = docs.select(
        F.col(id_col), F.explode(F.split(lowered, r"\s+")).alias("__w")
    )
    wc = words.groupBy(id_col, "__w").agg(F.count("*").alias("__c"))
    top = wc.groupBy(id_col).agg(
        (F.max("__c").cast("double") / F.sum("__c").cast("double")).alias(
            "top_word_frac"
        ),
        F.sum("__c").cast("long").alias("n_words"),
    )
    # word_bigrams: zip form, O(len)/row — the transform-over-sequence
    # + element_at form re-evaluates the split per element (measured
    # 4.6s vs 0.4s warm on 5k docs for identical output) and errors on
    # 1-word docs (sequence(1,0) descends to element_at index 0 under
    # ANSI).  Docs with <2 words have an empty bigram list; ANSI-mode
    # Spark raises DIVIDE_BY_ZERO even for double 0/0, while DuckDB
    # yields NULL — guard with `when` so both engines emit NULL.
    bi = docs.withColumn("__bg", word_bigrams(F.col(text_col))).select(
        F.col(id_col),
        F.when(
            F.size("__bg") > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(F.col("__bg"))).cast("double")
            / F.size(F.col("__bg")).cast("double"),
        ).alias("dup_bigram_frac"),
    )
    return top.join(bi, id_col)


def chunk_documents(
    docs: DataFrame,
    size: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size character chunks
    (size=200, stride=150 -> 50-char overlap) — the standard prep for
    context-window-bounded embedding / retrieval corpora.

    Chunk starts are 1, 1+stride, 1+2*stride, ... while the start lies
    inside the document, i.e. chunk_id in [0, floor((len-1)/stride)].
    Empty documents produce zero chunks (without the length filter,
    ``sequence(0, -1)`` would descend and emit two spurious rows).
    Pure scan-stage expressions: ``sequence`` + ``posexplode`` +
    ``substring`` — no shuffle, no UDF; output is (doc, chunk) scalar
    rows with provenance for joining features back later.
    """
    n = F.length(F.col(text_col))
    idx = F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(stride)).cast("int"))
    docs = docs.filter(n > 0)
    out = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.substring(
                    F.col(text_col), i * F.lit(stride) + F.lit(1), size
                ),
            )
        ).alias("chunk_id", "chunk_text"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_text"),
        F.length("chunk_text").cast("long").alias("chunk_len"),
    )


# PII patterns: ASCII-only, no backreferences/lookaround, so Java regex
# (Spark) and RE2 (DuckDB) agree on every match boundary.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII signal counts + a redacted text column.

    Counts are non-overlapping regex match counts per pattern family;
    ``redacted`` replaces every match with a typed placeholder (applied
    in a fixed pattern order so the output string is deterministic).
    All native ``regexp_extract_all`` / ``regexp_replace`` — scan-stage,
    no shuffle; at 100 TB this is the shape of a compliance sweep that
    must touch every byte exactly once.
    """
    text = F.col(text_col)
    counts = {
        f"n_{name}": F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    redacted = text
    for name, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    any_pii = None
    for c in counts.values():
        any_pii = c if any_pii is None else (any_pii + c)
    return docs.select(
        F.col(id_col),
        *[c.alias(n) for n, c in counts.items()],
        (any_pii > 0).cast("int").alias("has_pii"),
        redacted.alias("redacted"),
    )


def analyze(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    cols = {
        **token_count_cols(text),
        **quality_score_cols(text),
        **lang_marker_counts(text),
        "lang_pred": lang_id_col(text),
        "fingerprint": fingerprint_col(text),
    }
    return docs.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def rare_token_stats(
    docs: DataFrame,
    min_cf: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency quality signals (the data-driven complement to
    the static Gopher rules): a doc dominated by tokens the corpus has
    barely seen is OCR noise / mojibake / codeswitched junk; a doc of
    only ultra-common tokens is boilerplate.

    Output per doc: ``n_tokens``, ``rare_frac`` (fraction of token
    occurrences whose corpus collection frequency < ``min_cf``) and
    ``mean_token_cf`` (mean corpus frequency of the doc's tokens).
    Integer count sums divided in double -> bit-deterministic.

    Scale shape: pass 1 aggregates the vocabulary (shuffle keyed by
    token, map-side combine so the wire carries one row per distinct
    (partition, token)); pass 2 joins token occurrences back to the
    vocabulary (shuffle on token; Zipf hot keys are exactly what AQE
    skew splitting handles — the join is a pure equi-join) and
    re-aggregates per doc.  The vocabulary is NOT broadcast-hinted: at
    web scale it is millions of rows, and AQE will broadcast it when
    it turns out small.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__w"),
    )
    cf = words.groupBy("__w").agg(F.count("*").alias("__cf"))
    joined = words.join(cf, "__w")
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        (
            F.sum((F.col("__cf") < min_cf).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("rare_frac"),
        (F.sum("__cf").cast("double") / F.count("*").cast("double")).alias(
            "mean_token_cf"
        ),
    )


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram-LM surprisal scoring — the cheap stand-in for the
    KenLM-perplexity quality filter (CCNet buckets its corpus by LM
    perplexity; a unigram model needs no external artifacts and the
    same machinery scales to n-grams).

    Each token occurrence scores an integer surprisal
    ``ilog2(N) - ilog2(cf)`` bits, where ``N`` is the corpus token
    count, ``cf`` the token's collection frequency, and
    ``ilog2(x) = bit_length(x) - 1`` (integer-exact floor(log2) —
    fp log is not cross-engine-stable, see length_histogram).  A doc
    full of corpus-rare tokens scores high (OCR junk / mojibake); one
    of only stop-words scores near zero (boilerplate).

    Output per doc: ``n_tokens``, ``sum_surprisal_bits`` (exact
    BIGINT), ``mean_surprisal_bits`` (one exact-int division in
    double -> bit-deterministic).

    Scale shape: identical to :func:`rare_token_stats` — vocabulary
    aggregate (shuffle keyed by token, map-side combine), token
    join-back (equi-join, AQE splits Zipf hot keys), per-doc
    re-aggregate.  The corpus total ``N`` is a one-row aggregate
    broadcast into the projection; the vocabulary is deliberately NOT
    broadcast-hinted (millions of rows at web scale — AQE promotes it
    when small).
    """
    ilog2 = lambda c: (F.length(F.bin(c)) - F.lit(1)).cast("long")  # noqa: E731
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__w"),
    )
    cf = words.groupBy("__w").agg(F.count("*").alias("__cf"))
    # one-row corpus total: a broadcast nested-loop join whose build
    # side is exactly ONE row (the j6 scalar-dim shape; the declared
    # query carries the tiny-bnlj tag the guardrail sanctions for this)
    total = words.select(F.count("*").alias("__n_corpus"))
    joined = words.join(cf, "__w").crossJoin(F.broadcast(total))
    s = ilog2(F.col("__n_corpus")) - ilog2(F.col("__cf"))
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(s).cast("long").alias("sum_surprisal_bits"),
        (F.sum(s).cast("double") / F.count("*").cast("double")).alias(
            "mean_surprisal_bits"
        ),
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus line-level dedup (the CCNet prep: boilerplate
    lines — headers, cookie banners, navigation — repeat across
    documents and get removed before training).

    A line is KEPT in a document iff it is globally unique, or this
    document is the line's canonical owner (minimum doc id among the
    documents containing it; repeats within one document keep only the
    first position).  Output per doc: ``n_lines``, ``dup_line_frac``
    (fraction of the doc's lines removed), and ``cleaned_text`` (the
    kept lines rejoined in original order).

    Scale shape: posexplode lines -> one shuffle keyed by the line text
    for the global (min_doc, min_pos) owner aggregate -> join back on
    the line key (equi-join; AQE skew handles hot boilerplate lines) ->
    one shuffle keyed by doc to rebuild the text with an order-
    insensitive ``array_sort(collect_list(struct(pos, line)))`` (the
    collect is per-document, bounded by document size, never corpus-
    wide).  Whole docs are never carried through the line shuffle —
    only (line, doc, pos) triples.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    owner = lines.groupBy("__line").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("__pos").alias("p"))).alias(
            "__own"
        ),
        F.count("*").alias("__n"),
    )
    tagged = lines.join(owner, "__line").withColumn(
        "__keep",
        (F.col("__n") == 1)
        | (
            (F.col("__own.d") == F.col(id_col))
            & (F.col("__own.p") == F.col("__pos"))
        ),
    )
    return tagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        (
            F.sum((~F.col("__keep")).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("dup_line_frac"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("__pos").alias("p"), F.col("__line").alias("l")),
                        )
                    )
                ),
                lambda s: s["l"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )


def gopher_flag_cols(text_col) -> dict:
    """The Gopher gate's flag COLUMNS over a text column — the
    expression form of :func:`gopher_flags`, for callers that fuse the
    gate into an existing scan projection instead of scanning the
    corpus a second time and joining (r16: fixed_point_quality's weak
    labels, guide §2.4)."""
    ws = F.split(F.lower(F.trim(text_col)), r"\s+")
    n_words = F.size(ws).cast("long")
    total_word_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long")
    n_sym = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", "")).cast("long")
    mean_wlen = total_word_chars.cast("double") / n_words.cast("double")
    sym_ratio = n_sym.cast("double") / n_words.cast("double")
    alpha_frac = n_alpha_words.cast("double") / n_words.cast("double")
    f_count = (n_words >= 5) & (n_words <= 10000)
    f_wlen = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    f_sym = sym_ratio <= 0.5
    f_alpha = alpha_frac >= 0.6
    return {
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "symbol_word_ratio": sym_ratio,
        "alpha_word_frac": alpha_frac,
        "ok_word_count": f_count,
        "ok_word_len": f_wlen,
        "ok_symbols": f_sym,
        "ok_alpha_words": f_alpha,
        "keep": f_count & f_wlen & f_sym & f_alpha,
    }


def gopher_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher/MassiveText-style composite quality gate: per-doc boolean
    flags for each rule plus the final keep verdict, so the audit table
    shows WHY a document was dropped, not just that it was.

    Rules (all integer-ratio math -> bit-deterministic):
    * word count in [5, 10000]
    * mean word length in [2, 12] chars
    * symbol-to-word ratio (#/ellipsis proxies via non-alnum-space
      chars) <= 0.5
    * at least 60% of words contain an alphabetic character

    One scan-stage projection — no shuffle, no Python; the downstream
    filter is ``keep = every flag true``.
    """
    cols = gopher_flag_cols(F.col(text_col))
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )


def ttr_hapax(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical diversity per doc: type-token ratio (distinct/total
    tokens) and hapax fraction (share of the doc's distinct tokens
    occurring exactly once IN THE DOC).  Machine-generated spam skews
    low-TTR; OCR noise skews hapax-heavy.  Contrast rare_token_stats,
    which rates tokens against the CORPUS — this is purely
    intra-document.

    Scale shape: explode + one shuffle keyed by (doc, word) with
    map-side combine (one wire row per distinct doc-word), then a
    per-doc re-aggregate — the repetition_stats discipline.  A
    nested-HOF form (filter-within-filter over the token array) would
    be O(types x tokens) per document; the aggregate form is
    O(tokens)."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__w"),
    )
    wc = words.groupBy(id_col, "__w").agg(F.count("*").alias("__c"))
    return wc.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        (F.count("*").cast("double") / F.sum("__c").cast("double")).alias("ttr"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias("n_hapax"),
        (
            F.sum((F.col("__c") == 1).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("hapax_frac"),
    )


def doc_bigram_surprisal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram-LM surprisal scoring — the second-order upgrade of
    :func:`unigram_surprisal` (one step closer to the KenLM perplexity
    filter CCNet buckets by): each bigram occurrence scores
    ``ilog2(C(w1 *)) - ilog2(C(w1 w2))`` bits against a bigram LM
    estimated from the corpus itself, so documents full of improbable
    word *transitions* (shuffled text, spam keyword strings) score
    high even when every individual word is common — exactly the
    failure mode a unigram model cannot see.

    Integer bit-length surprisal (``ilog2(x) = bit_length(x) - 1``)
    keeps the score cross-engine-exact; the per-doc mean is one
    int/int double division.  Docs with <2 words have no bigrams and
    are absent (score undefined, not zero).

    Scale shape: one bigram-count shuffle with map-side combine (the
    LM fit), a context re-aggregate O(vocab), and one equi-join of the
    bigram stream back to the LM — deliberately NOT broadcast-hinted
    (a web-corpus bigram table is billions of rows; AQE promotes it
    when it is small).  Same discipline as unigram_surprisal but the
    join key is the bigram, whose frequency skew is milder than
    unigrams' (Zipf mass spreads across contexts); AQE skew-split
    covers the residual hot pairs.
    """
    ilog2 = lambda c: (F.length(F.bin(c)) - F.lit(1)).cast("long")  # noqa: E731
    bgs = docs.select(
        F.col(id_col), F.explode(word_bigrams(F.col(text_col))).alias("__bg")
    )
    c12 = bgs.groupBy("__bg").agg(F.count("*").alias("__c12"))
    ctx = (
        c12.groupBy(F.substring_index("__bg", " ", 1).alias("__w1"))
        .agg(F.sum("__c12").cast("long").alias("__c1"))
    )
    lm = c12.join(ctx, F.substring_index(c12["__bg"], " ", 1) == ctx["__w1"]).select(
        "__bg", "__c12", "__c1"
    )
    joined = bgs.join(lm, "__bg")
    s = ilog2(F.col("__c1")) - ilog2(F.col("__c12"))
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(s).cast("long").alias("sum_surprisal_bits"),
        (F.sum(s).cast("double") / F.count("*").cast("double")).alias(
            "mean_surprisal_bits"
        ),
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib-compressibility per document: compressed_bytes /
    raw_bytes — the entropy-proxy quality signal curation pipelines
    use alongside rule gates (machine-generated/repetitive text
    compresses far below natural prose; random noise barely
    compresses).  Complements `repetition_stats`, which only sees
    word-level bigram repeats: DEFLATE catches byte-level templating,
    long-range copies within the doc, and character-level loops.

    This is deliberately an Arrow-batched ``mapInPandas`` stage (the
    engine's Python-stage discipline: batch-columnar, never per-row
    Python UDF) because no SQL engine exposes DEFLATE as a scalar —
    hence a rows-only declared query.  Scale: scan-stage, no shuffle;
    cost is the compressor itself (~100 MB/s/core), so at 100 TB run
    it ON the quality-sampling slice, not the raw crawl, or accept
    ~1 core-hour per 360 GB.
    """
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    out_schema = (
        f"{id_col} long, n_bytes long, n_compressed long, "
        "compression_ratio double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = [t.encode("utf-8") if isinstance(t, str) else b""
                   for t in pdf[text_col]]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "n_compressed": pd.Series(nc, dtype="int64"),
                    # pandas NaN crosses Arrow as SQL NULL - the right
                    # semantics for "no bytes to measure"
                    "compression_ratio": [
                        (c / b) if b else float("nan") for b, c in zip(nb, nc)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)
