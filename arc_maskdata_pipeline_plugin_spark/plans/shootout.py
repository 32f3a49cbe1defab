"""Tokenizer shoot-out capstone: train all THREE tokenizer families on the
same corpus — byte-pair merges (plans/bpe.py, GPT-2 family), unigram-LM
(plans/unigram.py, SentencePiece/LLaMA family), WordPiece
(plans/wordpiece.py, BERT family) — and compare their corpus-level
compression on the SAME word population: total token counts and fertility
(tokens per word, fp6).

Comparability rules (documented, enforced identically in both engines):

* one shared tokenization (``_TOKS_SQL``: lowercase, strip non-[a-z0-9]);
* the shared word population is ``0 < len(word) <= _LMAX`` — the unigram /
  WordPiece DP bound (plans/unigram.py), applied to BPE too so all three
  count the same words;
* per-family token counts keep each family's OWN conventions: BPE counts
  the symbols of its trained segmentation INCLUDING the ``</w>`` terminal
  (the q_bpe_encode definition); unigram counts Viterbi pieces; WordPiece
  counts greedy longest-match pieces ([UNK] = 1). Fertility is therefore
  comparable WITHIN each family's published convention, and the ``</w>``
  inflation of BPE (~ +1/word) is called out here rather than hidden.
* ``fertility_fp6 = n_tokens * 10^6 div n_words`` — truncating integral
  division, identical in Spark and DuckDB.

Scale shape: each family's trainer already runs on the distinct-word
frame (corpus scanned once per family); the shoot-out adds only
word-frame joins and three 1-row aggregates. The unigram artifact comes
from the session memo (plans/unigram.py), so within a bench session the
EM does not re-run. The oracle runs each family's generated CTE chain in
its own scoped subquery (no CTE-name collisions), MATERIALIZED inside.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .bpe import N_MERGES as _BPE_N
from .bpe import _bpe_cte_chain, _train_bpe
from .registry import register
from .unigram import (
    _LMAX,
    _ROUNDS,
    _cte_round,
    _train_chain,
    _trained_vocab_rows,
    _uni_words,
    _viterbi_segments,
    _vocab_df,
)
from .wordpiece import N_WP_MERGES as _WP_N
from .wordpiece import _encode_chain, _wp_cte_chain, _wp_word_pieces

_SHOOTOUT_ORACLE = f"""
SELECT 'bpe' AS tokenizer, n_words, n_tokens,
       n_tokens * 1000000 // GREATEST(n_words, 1) AS fertility_fp6
FROM (
  {_bpe_cte_chain(_BPE_N)}
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_words,
         CAST(COALESCE(SUM(
           n * len(string_split_regex(trim(seq), '\\s+'))), 0) AS BIGINT)
           AS n_tokens
  FROM w{_BPE_N} WHERE len(word) <= {_LMAX} AND word <> ''
)
UNION ALL
SELECT 'unigram' AS tokenizer, n_words, n_tokens,
       n_tokens * 1000000 // GREATEST(n_words, 1) AS fertility_fp6
FROM (
  WITH {_train_chain()},
  {_cte_round("e", f"v{_ROUNDS}")},
  wk AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS k FROM sege GROUP BY word)
  SELECT CAST(COALESCE(SUM(w.n), 0) AS BIGINT) AS n_words,
         CAST(COALESCE(SUM(w.n * s.k), 0) AS BIGINT) AS n_tokens
  FROM words w JOIN wk s USING (word)
)
UNION ALL
SELECT 'wordpiece' AS tokenizer, n_words, n_tokens,
       n_tokens * 1000000 // GREATEST(n_words, 1) AS fertility_fp6
FROM (
  {_wp_cte_chain(_WP_N)},
  {_encode_chain(_WP_N)}
  SELECT CAST(COALESCE(SUM(w.n), 0) AS BIGINT) AS n_words,
         CAST(COALESCE(SUM(w.n * p.n_pieces), 0) AS BIGINT) AS n_tokens
  FROM words w JOIN wp p USING (word)
)
"""


@register("q_tokenizer_shootout", oracle=_SHOOTOUT_ORACLE)
def q_tokenizer_shootout(spark, sf_dir):
    """Train BPE, unigram-LM, and WordPiece on the corpus and compare
    corpus-level compression on the shared word population (module
    docstring: comparability rules, per-family counting conventions,
    fp6 fertility)."""
    # --- BPE: symbols of the trained segmentation, shared length filter
    _merges, final = _train_bpe(spark, sf_dir, _BPE_N)
    bpe = (
        final.filter(
            (F.length("word") <= _LMAX) & (F.col("word") != "")
        )
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce(
                F.sum(F.col("n") * F.size(F.split(F.trim("seq"), " +"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
        .select(F.lit("bpe").alias("tokenizer"), "n_words", "n_tokens")
    )
    # materialize before unpersisting the trainer's word frame
    bpe_row = bpe.first()
    final.unpersist()

    # --- unigram: Viterbi pieces under the session-memoized artifact
    uwords = _uni_words(spark, sf_dir)
    uvocab = _vocab_df(spark, _trained_vocab_rows(spark, sf_dir))
    wk = (
        _viterbi_segments(uwords, uvocab)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    uni = (
        uwords.join(wk, "word")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce(F.sum(F.col("n") * F.col("k")), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .select(F.lit("unigram").alias("tokenizer"), "n_words", "n_tokens")
    )

    # --- WordPiece: greedy longest-match pieces
    wpp = _wp_word_pieces(spark, sf_dir)
    wp = wpp.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce(F.sum(F.col("n") * F.col("n_pieces")), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
    ).select(F.lit("wordpiece").alias("tokenizer"), "n_words", "n_tokens")

    out = spark.createDataFrame(
        [tuple(bpe_row)], "tokenizer string, n_words bigint, n_tokens bigint"
    ).unionByName(uni).unionByName(wp)
    return out.withColumn(
        "fertility_fp6",
        F.expr("n_tokens * 1000000L div GREATEST(n_words, 1L)"),
    )
