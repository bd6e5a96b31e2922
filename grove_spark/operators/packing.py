"""Sequence packing and deterministic corpus sampling — the two batch
ops a tokens pipeline needs between dedup and the trainer.

* ``pack_sequences`` — greedy-concatenate-then-chunk packing: within
  each partition key, documents are laid out in a deterministic order,
  the running token count accumulates, and bin id = floor of the
  PRE-document cumulative sum / capacity. This is the standard
  "concat and chunk every `capacity` tokens" packing of LLM data
  pipelines (a document may straddle its bin's end — the trainer's
  chunker splits it), NOT bin-packing with rejection: it is exactly
  expressible as one window cumsum, so it costs ONE shuffle on the
  partition key. At 100 TB: the window partitions by ``by`` (e.g.
  source/shard); a single giant key would serialize — feed a composite
  key (source, shard_id) the way the corpus is already sharded.

* ``stratified_sample`` — per-stratum deterministic sampling by a hash
  of the id column: reruns pick the SAME rows (resume-safe, unlike
  ``df.sample`` whose row selection shifts with partitioning), and the
  rate is exact-in-expectation per stratum. The multiplier is the
  Knuth/Fibonacci 32-bit constant; the modulus arithmetic is plain
  BIGINT so any engine reproduces the selection bit-for-bit.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_KNUTH = 2654435761  # 32-bit golden-ratio multiplier


def pack_sequences(
    df: DataFrame,
    length_col: str = "n_tok",
    capacity: int = 4096,
    order_col: str = "doc_id",
    by: Optional[Sequence[str]] = ("source",),
    bin_col: str = "bin",
    allow_global: bool = False,
) -> DataFrame:
    """Assign each row the training-bin id it starts in.

    bin = floor((cumsum(length) - length) / capacity) over rows ordered
    by ``order_col`` within ``by``. Deterministic given the order column.

    ``by=()`` means ONE unpartitioned window — Spark executes that as a
    single task holding the whole corpus, which at 100 TB is a one-task
    job. That fallback is refused unless ``allow_global=True`` (and even
    then it warns): feed a composite key (source, shard_id) the way the
    corpus is already sharded.
    """
    by = list(by or [])
    if not by:
        import warnings

        msg = (
            "pack_sequences(by=()) uses a GLOBAL window — Spark runs it "
            "as a single task over the entire input; pass a partition "
            "key (e.g. by=('source', 'shard_id'))"
        )
        if not allow_global:
            raise ValueError(msg + ", or opt in with allow_global=True")
        warnings.warn(msg, stacklevel=2)
    w = (W.partitionBy(*by) if by else W.partitionBy()).orderBy(order_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = F.sum(F.col(length_col)).over(w)
    return df.withColumn(
        bin_col, F.floor((cum - F.col(length_col)) / F.lit(capacity)).cast("bigint")
    )


def global_token_shards(
    df: DataFrame,
    budget_tokens: int,
    order_col: str = "doc_id",
    length_col: str = "n_tok",
    out: str = "shard",
    n_parts: Optional[int] = None,
) -> DataFrame:
    """GLOBAL contiguous token-budget shard assignment — the training
    export writer's unit ("files of ~N tokens") — WITHOUT the
    single-task global window ``pack_sequences(by=())`` refuses.

    ``shard = floor(global_token_offset / budget_tokens)`` where the
    offset is the EXACT cumulative ``length_col`` over the total order
    of ``order_col`` — computed as the classic two-pass distributed
    prefix sum:

    1. range-repartition by ``order_col`` (non-overlapping key ranges,
       so partition order == key order);
    2. per-partition local cumsum (parallel windows, one per range);
    3. per-partition totals → driver prefix offsets (``n_parts``
       scalars — the only driver data);
    4. ``offset[pid] + local_cum − length`` is the exact global offset,
       independent of where the sampled range boundaries fell.

    The intermediate is persisted because steps 3 and 4 MUST read the
    same physical partitioning — re-running the sampled range exchange
    could place boundaries differently and desynchronize the pid→offset
    map. The persisted handle rides on the result as
    ``result._grove_persisted``; unpersist it when done (writers below
    do).

    Contract: a sequence STARTING in shard s stays in s, so each
    shard's token total is ≤ budget + (longest sequence − 1) —
    contiguous stream chunking, deterministic given ``order_col`` is a
    total order.

    Plan shape (verified): the range exchange, then the window's own
    ENSURE_REQUIREMENTS hash exchange on ``__pid`` (Catalyst cannot
    know the range placement already clustered it). Two O(data)
    exchanges, zero single-task stages — the price of staying fully
    JVM-side/spill-safe instead of an Arrow per-partition cumsum.
    """
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    length = F.coalesce(F.col(length_col).cast("long"), F.lit(0))
    w = (
        W.partitionBy("__pid").orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__cum", F.sum(length).over(w)).persist()
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum(length).alias("t")).collect()
    }
    if not totals:  # empty input: one empty shard column, same schema
        result = local.withColumn(out, F.lit(0).cast("long")).drop("__pid", "__cum")
        result._grove_persisted = local  # type: ignore[attr-defined]
        return result
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    omap = F.create_map(
        *[x for pid in sorted(offsets) for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    result = local.withColumn(
        out,
        F.floor(
            (omap[F.col("__pid")] + F.col("__cum") - length)
            / F.lit(budget_tokens)
        ),
    ).drop("__pid", "__cum")
    result._grove_persisted = local  # type: ignore[attr-defined]
    return result


def pack_stats(packed: DataFrame, by: Sequence[str] = ("source",), bin_col: str = "bin",
               length_col: str = "n_tok") -> DataFrame:
    """Per-bin packing telemetry: docs per bin + token fill."""
    return packed.groupBy(*by, bin_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(length_col).cast("bigint").alias("fill"),
    )


def stratified_sample(
    df: DataFrame,
    rates: Dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    modulus: int = 10_000,
) -> DataFrame:
    """Keep a deterministic ``rates[stratum]`` fraction of each stratum.

    Selection: ``pmod(pmod(id, modulus) * (KNUTH % modulus), modulus) <
    rate * modulus`` — the id must be integral (hash string ids to
    BIGINT first; xxhash64 ids are signed, which is why the formula uses
    pmod — a plain ``%`` keeps the dividend's sign and would admit every
    negative id at 100%) and the inner pmod keeps the multiply far from
    BIGINT overflow (Spark 4's default ANSI mode throws on it; ids near
    2^63 * KNUTH would otherwise abort the job). For non-negative ids
    the reduced form equals ``(id * KNUTH) % modulus`` exactly. Rates
    quantize to 1/modulus. Exactly reproducible across engines and
    reruns.
    """
    h = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(modulus))
        * F.lit(_KNUTH % modulus),
        F.lit(modulus),
    )
    keep = F.lit(int(default_rate * modulus))
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        thr = F.lit(int(rate * modulus))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = expr.otherwise(keep) if expr is not None else keep
    return df.where(h < thr_col)


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_word_max: float = 0.6,
    top_bigram_max: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    * ``dup_word_frac``   — 1 - distinct/total words (word-level
      repetition; the line-level rule collapses to this on single-line
      docs);
    * ``top_bigram_frac`` — occurrences of the most frequent word bigram
      / total bigrams (boilerplate loops);
    * ``is_repetitive``   — either signal over its threshold.

    The bigram mode is computed with ONE explode + two partial-agg
    groupBys on (doc, bigram) — no text re-shuffles beyond the exploded
    narrow pairs. Documents with < 2 words have no bigrams: frac 0.0.
    """
    words = F.split(F.col(text_col), " ")
    base = docs.select(
        id_col,
        F.size(words).cast("bigint").alias("__n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("__n_distinct"),
        words.alias("__w"),
    )
    bigrams = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.concat_ws(" ", F.slice("__w", i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__bg"),
    )
    top_bg = (
        bigrams.groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.max("__c").cast("bigint").alias("__top_bg"),
            F.sum("__c").cast("bigint").alias("__n_bg"),
        )
    )
    out = base.drop("__w").join(top_bg, id_col, "left")
    dup_frac = (
        F.lit(1.0) - F.col("__n_distinct").cast("double") / F.col("__n_words")
    )
    bg_frac = F.when(
        F.col("__n_bg").isNotNull() & (F.col("__n_bg") > 0),
        F.col("__top_bg").cast("double") / F.col("__n_bg"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        dup_frac.alias("dup_word_frac"),
        bg_frac.alias("top_bigram_frac"),
        ((dup_frac > dup_word_max) | (bg_frac > top_bigram_max)).alias(
            "is_repetitive"
        ),
    )


def mixture_sample(
    docs: DataFrame,
    weights: Dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    modulus: int = 10_000,
) -> DataFrame:
    """Sample a training mixture to a token budget (the Dolma/RedPajama
    mixing step): each source contributes ``weights[s]/sum(weights) *
    token_budget`` tokens, derived from its ACTUAL token mass — sources
    with more than their share are deterministically downsampled,
    sources with less are upsampled with full epochs plus a fractional
    sampled epoch (the output carries an ``epoch`` column so the trainer
    can interleave).

    Everything runs in Catalyst: the per-source token totals are a tiny
    aggregate broadcast-joined back (never collected to the driver), the
    rate arithmetic is plain DOUBLE ops an oracle engine reproduces
    bit-for-bit, and row selection reuses stratified_sample's hash
    (pmod-reduced Knuth multiply), so reruns and other engines pick the
    SAME rows. Sources absent from ``weights`` contribute nothing.

    At 100 TB: one partial-agg shuffle for the totals, a broadcast join,
    and a narrow explode whose fan-out is the per-source epoch count —
    no skewed shuffle (the explode multiplies rows evenly within each
    source partition).
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive: {token_budget}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    tot = docs.groupBy(source_col).agg(
        F.sum(token_col).cast("double").alias("__avail")
    )
    wexpr = None
    for s, w in sorted(weights.items()):
        cond = F.col(source_col) == s
        wexpr = F.when(cond, float(w)) if wexpr is None else wexpr.when(cond, float(w))
    wexpr = wexpr.otherwise(F.lit(0.0)) if wexpr is not None else F.lit(0.0)
    rate = (wexpr / F.lit(wsum)) * F.lit(float(token_budget)) / F.col("__avail")
    dim = tot.select(
        source_col,
        # zero-mass guard (ADVICE r3): a weighted source whose rows all
        # have zero/null token counts must contribute nothing — an
        # unguarded division yields rate=Infinity, and floor(inf) is an
        # ANSI overflow (or an enormous epoch explode)
        F.when(F.col("__avail") > 0, rate).otherwise(F.lit(0.0)).alias(
            "__rate"
        ),
    ).select(
        source_col,
        F.floor("__rate").cast("int").alias("__copies"),
        F.floor((F.col("__rate") - F.floor("__rate")) * F.lit(modulus))
        .cast("bigint")
        .alias("__thr"),
    )
    h = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(modulus))
        * F.lit(_KNUTH % modulus),
        F.lit(modulus),
    )
    return (
        docs.join(F.broadcast(dim), source_col)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__copies")))
        )
        .where((F.col("epoch") < F.col("__copies")) | (h < F.col("__thr")))
        .drop("__copies", "__thr")
    )


def ngram_lm_score(
    docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model quality scoring without an external
    model: a bigram LM with add-k smoothing is trained on ``ref_docs``
    (the trusted corpus) as two DataFrame aggregations, and every
    document in ``docs`` is scored by its mean log2 bigram probability —
    low scores mark text unlike the reference (gibberish, boilerplate,
    wrong language), the standard perplexity-filter signal.

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k * V), with V the
    reference's bigram-context vocabulary size (distinct first words).
    Unseen contexts/bigrams get the smoothed floor, so every document
    scores. Docs with < 2 words have no bigrams: score null.

    Plan shape at 100 TB: two partial-agg shuffles build the count
    dims; scoring is one explode + two joins. The c1/vocab dims are
    context-vocabulary-sized and broadcast, but c12 scales with DISTINCT
    BIGRAMS — on a web corpus that exceeds the broadcast threshold and
    the exploded bigram pairs shuffle on (w1, w2). Cap the reference
    corpus (the LM needs a sample, not the whole lake) or prune
    singleton bigrams from c12 (they only contribute the smoothed floor,
    so dropping count-1 entries changes scores by at most
    log2((1+k)/k) per bigram) before joining at full scale. The vocab
    size rides along as a broadcast 1-row dim — constructing the
    operator launches no job.
    """
    def bigrams(df):
        w = F.split(F.col(text_col), " ")
        return df.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.get(w, i - 1).alias("w1"),
                            F.get(w, i).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("bg"),
        ).select(id_col, "bg.w1", "bg.w2")

    ref_bg = bigrams(ref_docs)
    c12 = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = ref_bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("__vocab"))  # 1-row dim, lazy

    scored = (
        bigrams(docs)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                F.log2(
                    (F.coalesce("c12", F.lit(0)) + F.lit(k))
                    / (F.coalesce("c1", F.lit(0))
                       + F.lit(k) * F.col("__vocab"))
                )
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("lp").alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_bigrams",
            (F.col("_sum_lp") / F.col("n_bigrams")).alias("mean_log2p"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            "mean_log2p",
        )
    )
