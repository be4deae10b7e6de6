"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure Spark SQL Column expressions (whole-stage codegen, no Python in the
hot path) — at 100 TB these run entirely JVM-side with predicate pushdown.
Each has a DuckDB-portable formulation used by the driver oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword marker lists (shared with oracle SQL)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "la", "les", "des"],
    "es": ["el", "de", "la", "los", "y"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: BPE-ish token regex: letter runs, digit runs, single other non-space chars
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    # F.lit pattern avoids SQL string-literal backslash mangling of \s
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(t), "\\s+"))
    ).withColumn(
        "re_tokens", F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), F.lit(0)))
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit heuristics (the standard
    pre-training quality filters)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), "\\s+")
    n_words = F.size(words)
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.round((F.length(F.regexp_replace(t, "\\s+", "")) / n_words), 6),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                F.length(F.regexp_replace(t, "[^0-9]", "")) / n_chars, 6
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.length(F.regexp_replace(t, "[^.,;:!?]", "")) / n_chars, 6
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.expr(
                    f"size(filter(split(trim({text_col}), '\\\\s+'), w -> w IN ({sw})))"
                )
                / n_words,
                6,
            ),
        )
    )


#: PII classes scrubbed by pii_redact — patterns restricted to the
#: RE2 ∩ Java-regex common dialect so the DuckDB oracle runs them verbatim
PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("phone", r"\+\d{2}[- ]\d{3}[- ]\d{3}[- ]\d{4}"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"),
)


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing (emails, phone numbers, IPv4) — the standard
    pre-training redaction pass, as pure Column regexp expressions
    (whole-stage codegen; at 100 TB this is a map-only stage with zero
    shuffle). Classes are counted and replaced SEQUENTIALLY (email first), so
    later patterns see earlier redaction markers — a deterministic order the
    oracle mirrors. -> (doc_id, n_email, n_phone, n_ipv4, redacted_md5);
    the md5 of the scrubbed text keeps the full redaction output
    value-checked without shipping the text."""
    cur: Column = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, F.lit(pat), F.lit(f"[REDACTED_{name.upper()}]"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        counts["email"].cast("int").alias("n_email"),
        counts["phone"].cast("int").alias("n_phone"),
        counts["ipv4"].cast("int").alias("n_ipv4"),
        F.md5(cur).alias("redacted_md5"),
    )


#: interpretable linear quality model over the engine's own text features —
#: the fastText-style filter SHAPE (learned weights would drop in unchanged)
QUALITY_WEIGHTS = {
    "bias": -1.2,
    "stopword_ratio": 6.0,
    "digit_ratio": -8.0,
    "punct_ratio": -3.0,
    "mean_word_len": 0.12,
}


def quality_classifier(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document-quality classifier inference as pure Column arithmetic (no
    UDF, no shuffle): logistic score over quality_scores' 6dp-rounded
    features. ``keep`` thresholds the LOGIT at 0 (pre-sigmoid), so engines
    cannot disagree at the boundary — the rounded features make the linear
    combination bit-identical across Spark and the SQL oracle."""
    feats = quality_scores(df, text_col)
    logit = F.lit(QUALITY_WEIGHTS["bias"])
    for fname, w in QUALITY_WEIGHTS.items():
        if fname == "bias":
            continue
        logit = logit + F.lit(w) * F.col(fname)
    return (
        feats.withColumn("q_logit", F.round(logit, 6))
        .withColumn("q_score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6))
        .withColumn("keep", (logit >= 0))
    )


#: Gopher / MassiveText repetition-free document-level rule bounds
#: (Rae et al. 2021, "Scaling Language Models", Table A1 shape) — the
#: standard rule-based pre-training filter; thresholds are the published
#: ones except the word-count floor, scaled to the fixture's short docs
GOPHER_BOUNDS = {
    "min_words": 10,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_ratio": 0.8,
    "min_stopword_hits": 2,
}


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-level quality rules as pure Column expressions
    (map-only, whole-stage codegen, zero shuffle at 100 TB): word-count
    bounds, mean-word-length bounds, symbol-to-word ratio ('#'/ellipsis),
    alphabetic-word fraction, and distinct-stopword hits. Emits one boolean
    per rule plus the conjunction ``keep`` — rule-level booleans are what a
    curation pipeline aggregates for per-rule rejection stats."""
    b = GOPHER_BOUNDS
    t = F.col(text_col)
    words = F.split(F.trim(t), "\\s+")
    n_words = F.size(words)
    mean_wl = F.length(F.regexp_replace(t, "\\s+", "")) / n_words
    n_symbols = F.length(F.regexp_replace(t, "[^#]", "")) + F.size(
        F.regexp_extract_all(t, F.lit("\\.\\.\\."), F.lit(0))
    )
    alpha_frac = (
        F.expr(f"size(filter(split(trim({text_col}), '\\\\s+'), w -> w rlike '[a-zA-Z]'))")
        / n_words
    )
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    sw_hits = F.expr(
        f"size(array_distinct(filter(split(trim({text_col}), '\\\\s+'),"
        f" w -> w IN ({sw}))))"
    )
    rules = {
        "r_word_count": (n_words >= b["min_words"]) & (n_words <= b["max_words"]),
        "r_mean_word_len": (mean_wl >= b["min_mean_word_len"])
        & (mean_wl <= b["max_mean_word_len"]),
        "r_symbol_ratio": (n_symbols / n_words) <= b["max_symbol_word_ratio"],
        "r_alpha_words": alpha_frac >= b["min_alpha_word_ratio"],
        "r_stopwords": sw_hits >= b["min_stopword_hits"],
    }
    out = df
    keep = F.lit(True)
    for name, c in rules.items():
        out = out.withColumn(name, c)
        keep = keep & c
    return out.withColumn("keep", keep)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-marker language ID: score = marker-word hits per
    language, predicted = argmax (ties -> lexicographically first language,
    deterministic). Pure Column expressions."""
    words = f"split(trim({text_col}), '\\\\s+')"
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            F.expr(f"size(filter({words}, w -> w IN ({lst})))").alias(f"score_{lang}")
        )
    out = df.select("*", *scores)
    # argmax with deterministic tie-break on language name
    struct_arr = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(-i).alias("tie"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(LANG_MARKERS))
        ]
    )
    return out.withColumn("pred_lang", F.array_max(struct_arr)["lang"])


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-self unigram LM scoring — the CCNet/Wikipedia-LM quality
    filter re-expressed Spark-first: per-document mean negative log
    likelihood under the corpus's OWN add-alpha-smoothed unigram
    distribution (documents full of rare junk tokens score high, fluent
    boilerplate scores low; threshold or feed to importance_sample).

    -> (id_col, n_tokens, nll): nll = mean over tokens of
    -ln((count + alpha) / (N + alpha * V)). Per-token logprobs are
    quantized to INTEGER micro-nats before the mean, so the document sum is
    exact under ANY summation order — the mean is bit-identical across
    engines (a plain float mean would drift with partial-agg order); only
    the per-token ln carries ulp noise, absorbed by the quantization (the
    tfidf oracle precedent).

    Scale shape: two shuffles total at any corpus size — one groupBy(word)
    builds the distribution, one groupBy(doc) averages — and the
    token->logprob equi-join carries ONE build row per word, so a Zipf-head
    word is a wide-but-flat join key (AQE skew split handles it), never a
    quadratic bucket."""
    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(t, " ")).alias("word")
    ).where(F.col("word") != "")
    # r6: vocab feeds totals AND the logp build side — one tokenize +
    # groupBy instead of two (lazy localCheckpoint, see dedup.py)
    vocab = toks.groupBy("word").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    logp = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "word",
            F.round(
                -F.log(
                    (F.col("c") + F.lit(alpha))
                    / (F.col("n_total") + F.lit(alpha) * F.col("v_size"))
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("neg_logp_u"),  # integer micro-nats: order-proof sums
        )
    )
    return (
        toks.join(logp, "word")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.sum("neg_logp_u").alias("_u"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round(
                F.col("_u") / (F.col("n_tokens") * F.lit(1_000_000.0)), 6
            ).alias("nll"),
        )
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram LM scoring — the step up from
    :func:`unigram_logprob_scores` (CCNet uses a 5-gram KenLM; the bigram
    captures the word-ORDER signal a unigram cannot: shuffled fluent text
    scores like fluent text under a unigram but junk under a bigram).

    Per document: mean over adjacent word pairs (w1, w2) of
    ``-ln(lam * p_b(w2|w1) + (1-lam) * p_u(w2))`` with add-alpha smoothing,
    both distributions estimated from the corpus itself:
    ``p_b = (c(w1 w2) + alpha) / (c(w1) + alpha * V)``,
    ``p_u = (c(w2) + alpha) / (N + alpha * V)``. Per-pair logprobs quantize
    to INTEGER micro-nats before the mean (order-proof sums, the
    unigram/tfidf oracle precedent). -> (id_col, n_bigrams, nll); documents
    with fewer than two tokens produce no row.

    Scale shape: one window shuffle on the doc id forms pairs, two
    groupBys build the distributions, and the pair->stats equi-joins carry
    ONE build row per (bigram | word) — Zipf heads are wide-but-flat join
    keys (AQE skew split), never quadratic buckets."""
    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(t, " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    win = Window.partitionBy("id").orderBy("pos")
    # r6: bi feeds the bigram-count groupBy AND the scored join chain, and
    # vocab feeds totals + both unigram-count join sides — materialize each
    # once within this DAG instead of re-running the tokenize + window
    # shuffle 3-4x (lazy localCheckpoint: no CacheManager entry, fresh
    # invocations recompute; see dedup.py)
    bi = toks.withColumn("w2", F.lead("word").over(win)).where(
        F.col("w2").isNotNull()
    ).select("id", F.col("word").alias("w1"), "w2").localCheckpoint(eager=False)
    vocab = toks.groupBy("word").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    totals = vocab.agg(F.sum("c").alias("n_total"), F.count("*").alias("v_size"))
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    p_b = (F.col("cb") + F.lit(alpha)) / (
        F.col("c1") + F.lit(alpha) * F.col("v_size")
    )
    p_u = (F.col("c2") + F.lit(alpha)) / (
        F.col("n_total") + F.lit(alpha) * F.col("v_size")
    )
    scored = (
        bi.join(bic, ["w1", "w2"])
        .join(vocab.select(F.col("word").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(vocab.select(F.col("word").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.round(
                -F.log(F.lit(lam) * p_b + F.lit(1.0 - lam) * p_u)
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("nl_u"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.count("*").cast("int").alias("n_bigrams"), F.sum("nl_u").alias("_s"))
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            F.round(
                F.col("_s") / (F.col("n_bigrams") * F.lit(1_000_000.0)), 6
            ).alias("nll"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the sequence-prep primitive
    (context-window chunks for training/embedding): whitespace tokens in
    windows of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``;
    the final window is ragged (whatever remains), and a document shorter
    than one window yields exactly one chunk.
    -> (id, chunk_idx, n_tokens, chunk_text).

    Map-only Column expressions (split -> sequence -> explode -> slice):
    no shuffle, no UDF — scales as a pure projection."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    step = chunk_tokens - overlap
    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    words = F.split(t, " ")
    n = F.size(words)
    # number of windows: ceil(max(n - overlap, 1) / step)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            words.alias("w"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "id",
            "chunk_idx",
            F.slice(
                F.col("w"), F.col("chunk_idx") * step + 1, chunk_tokens
            ).alias("cw"),
        )
        .select(
            "id",
            "chunk_idx",
            F.size("cw").cast("int").alias("n_tokens"),
            F.array_join("cw", " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 128,
    bucket_col: str = "bucket",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy next-fit sequence packing — fill fixed-size context windows
    with whole documents (the training-batch packing step): within each
    bucket, docs are scanned in id order and appended to the current
    sequence until the next doc would overflow ``capacity`` tokens, which
    opens a new sequence. A doc longer than capacity gets its own sequence
    (chunk first via chunk_documents if that matters).
    -> (bucket, id, n_tokens, seq_idx).

    Distributed shape: packing is inherently sequential, so it runs
    per-bucket (one Arrow group each) — exactly how production packing
    shards: a deterministic bucket key partitions the corpus, each
    executor packs its buckets independently, determinism comes from the
    in-bucket id order, not from partitioning."""
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    toks = df.select(
        F.col(bucket_col).cast("int").alias("bucket"),
        F.col(id_col).cast("long").alias("id"),
        F.size(F.split(t, " ")).cast("int").alias("n_tokens"),
    )
    schema = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("id", LongType()),
            StructField("n_tokens", IntegerType()),
            StructField("seq_idx", IntegerType()),
        ]
    )
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        first = True
        for n in pdf["n_tokens"]:
            if not first and fill + n > cap:
                b += 1
                fill = n
            else:
                fill += n
            first = False
            bins.append(b)
        pdf["seq_idx"] = pd.Series(bins, dtype="int32")
        return pdf[["bucket", "id", "n_tokens", "seq_idx"]]

    return toks.groupBy("bucket").applyInPandas(pack, schema=schema)


def text_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: lower -> collapse whitespace -> md5.
    (The exact-dedup key; a rolling-hash analog lives in dedup.simhash.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document, pure DataFrame ops (no MLlib):
    tf = term count in doc; idf = ln((N + 1) / (df + 1)) + 1 (smoothed);
    ties break on term asc. Shuffles: one per aggregation level, all
    map-side combinable; the tiny (N) scalar broadcasts via crossJoin.
    -> (id, term, score, rank)."""
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    words = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(norm, " ")).alias("term")
    ).where(F.col("term") != "")
    # r6: tf feeds both the document-frequency aggregation and the scored
    # join — one tokenize + groupBy instead of two (lazy localCheckpoint)
    tf = words.groupBy("id", "term").agg(F.count("*").alias("tf")).localCheckpoint(
        eager=False
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("id", "term", "score", "rank")
    )


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    'Scaling Language Models' quality rules — public):

      - dup_line_frac: fraction of lines that are duplicates of an earlier
        line (1 - distinct/total), pure Column expressions;
      - top_ngram_frac: fraction of all word n-gram OCCURRENCES taken by the
        single most frequent n-gram (boilerplate detector), via
        explode + count + max — all map-side combinable aggregations.

    -> (id, n_lines, dup_line_frac, top_ngram_frac). Documents shorter than
    ``ngram_n`` words get top_ngram_frac 0.0."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines), 6
        ).alias("dup_line_frac"),
    )
    from .dedup import word_ngrams

    exploded = word_ngrams(df, text_col, id_col, n=ngram_n, distinct=False)
    per_gram = exploded.groupBy("id", "ngram").agg(F.count("*").alias("c"))
    top = per_gram.groupBy("id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    return base.join(top, "id", "left").select(
        "id",
        "n_lines",
        "dup_line_frac",
        F.coalesce(
            F.round(F.col("top_c") / F.col("total_c"), 6), F.lit(0.0)
        ).alias("top_ngram_frac"),
    )
