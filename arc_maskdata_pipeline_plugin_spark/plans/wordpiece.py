"""WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
train + greedy longest-match encode, fully oracle-checked. Completes the
tokenizer-family trio: byte-pair merges (plans/bpe.py, GPT-2 family),
unigram-LM (plans/unigram.py, SentencePiece/LLaMA family), WordPiece
(this module, BERT family).

TRAINING is BPE-shaped (same corpus-scanned-once word frame, same
double-space ``replace`` merge trick — see plans/bpe.py module docstring)
with two WordPiece-specific differences:

* symbolization uses the ``##`` continuation convention: ``hello`` →
  ``h ##e ##l ##l ##o`` (no ``</w>`` terminal); a merge concatenates
  ``lhs || strip_leading_##(rhs)``, so ``h + ##e → he`` and
  ``##l + ##o → ##lo`` — token text never embeds an interior ``##``.
* the merge objective is the WordPiece LIKELIHOOD score
  ``count(pair) / (count(lhs) * count(rhs))`` instead of raw pair count.
  Cross-engine exactness: the score is discretized as
  ``floor(c_pair * 10^18 / (c_lhs * c_rhs))`` — integer division that
  Spark (DECIMAL(38,0) IntegralDivide) and DuckDB (HUGEINT ``//``)
  truncate identically, so the argmax with tiebreak
  (score DESC, pair count DESC, lhs, rhs) is deterministic and identical
  in both engines. 10^18 resolution; numerator ≤ 10^13 · 10^18 = 10^31
  fits both engines' 128-bit lanes, and the quotient is ≤ 10^18 (c_pair ≤
  min(c_lhs, c_rhs) ≤ c_lhs·c_rhs), so it lands back in int64.

ENCODING is real WordPiece inference — greedy LONGEST-MATCH-FIRST over
the trained vocabulary (initial alphabet ∪ merged tokens), not a replay
of training segmentations: at each position take the longest vocab piece
matching (word-initial pieces at position 0, ``##`` pieces after), whole
word → [UNK] on a miss. The greedy loop is unrolled to ``_LMAX`` levels
(words longer than ``_LMAX`` chars are excluded by rule, the
plans/unigram.py discipline): each level joins the ACTIVE distinct-word
states against candidate (position, length) substrings equi-joined to the
broadcast vocabulary and advances by the max matched length. Levels are
``localCheckpoint(eager=True)``-ed — iterative-loop rule (plan
canonicalization OOMs on doubling lineage otherwise).

Scale shape: training = one corpus scan, then N_MERGES rounds on the
distinct-word frame (map-side-combined symbol/pair aggregates + a 1-row
driver argmax each). Encode = _LMAX levels on the distinct-word frame
with a broadcast vocab (alphabet + N_MERGES pieces), then ONE corpus
tokenize joined on the word key — the DP never touches the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from .lm import _TOKENS, _TOKS_SQL
from .registry import T, persisted, register, spread
from .unigram import _LMAX

N_WP_MERGES = 10
_FP = 10**18

# round-0 symbolization: first char bare, every later char ##-prefixed,
# double-space separated with leading/trailing pads (the replace-trick
# invariant, plans/bpe.py)
_W0_SQL = (
    "'  ' || substr(word, 1, 1) || '  ' || "
    "regexp_replace(word[2:], '(.)', '##\\1  ', 'g')"
)


def _w0_col(word):
    return F.concat(
        F.lit("  "),
        F.substring(word, 1, 1),
        F.lit("  "),
        F.regexp_replace(F.expr("substring(word, 2)"), "(.)", "##$1  "),
    )


def _wp_cte_chain(n_merges: int) -> str:
    """Shared WITH-chain: word counts → w0 → (symbol counts, scored pairs,
    best, w{i+1})* — the DuckDB mirror of :func:`_train_wordpiece`."""
    rounds = []
    for i in range(n_merges):
        rounds.append(f"""
sy{i} AS MATERIALIZED (SELECT n, string_split_regex(trim(seq), '\\s+') AS toks FROM w{i}),
u{i} AS MATERIALIZED (
  SELECT t AS sym, CAST(SUM(n) AS BIGINT) AS c
  FROM (SELECT n, unnest(toks) AS t FROM sy{i}) GROUP BY t
),
p{i} AS MATERIALIZED (
  SELECT p.l AS lhs, p.r AS rhs, CAST(SUM(n) AS BIGINT) AS c
  FROM (
    SELECT n, unnest(list_transform(range(1, len(toks)),
      i -> {{'l': toks[CAST(i AS INT)], 'r': toks[CAST(i + 1 AS INT)]}})) AS p
    FROM sy{i}
  ) GROUP BY p.l, p.r
),
s{i} AS MATERIALIZED (
  -- exact rational argmax: floor(c * 10^18 / (c_l * c_r)) in HUGEINT —
  -- DuckDB DECIMAL // ROUNDS, HUGEINT // truncates like Spark's decimal
  -- IntegralDivide
  SELECT p.lhs, p.rhs, p.c,
         CAST(CAST(p.c AS HUGEINT) * {_FP} // (ul.c * ur.c) AS BIGINT)
           AS score_fp18
  FROM p{i} p
  JOIN u{i} ul ON ul.sym = p.lhs
  JOIN u{i} ur ON ur.sym = p.rhs
),
b{i} AS MATERIALIZED (
  SELECT lhs, rhs,
         lhs || regexp_replace(rhs, '^##', '') AS merged,
         c, score_fp18
  FROM s{i} ORDER BY score_fp18 DESC, c DESC, lhs, rhs LIMIT 1
),
w{i + 1} AS MATERIALIZED (
  -- LEFT JOIN ON TRUE: an exhausted round leaves seq unchanged
  SELECT word, n,
         COALESCE(replace(seq, ' ' || b.lhs || '  ' || b.rhs || ' ',
                          ' ' || b.merged || ' '), seq) AS seq
  FROM w{i} LEFT JOIN b{i} b ON TRUE
)""")
    return f"""
WITH tk AS MATERIALIZED (SELECT {_TOKS_SQL} AS toks FROM documents),
words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(toks) AS word FROM tk) WHERE word <> '' GROUP BY word
),
w0 AS MATERIALIZED (
  SELECT word, n, {_W0_SQL} AS seq FROM words
),
{", ".join(rounds)}"""


# Session-scoped trained-artifact memo (VERDICT r11 #2; the unigram
# precedent, plans/unigram.py): q_wordpiece_encode and the shoot-out
# re-ran the full likelihood-score trainer (N 1-row argmax actions) before
# applying the vocabulary. Keyed (applicationId, sf_dir, n_merges); holds
# "merges" (≤ n_merges rows) and, once _wp_word_pieces has derived it,
# "alpha" (the w0 symbol alphabet, ≤ 2·|charset| rows) — both
# module-constant-bounded, never corpus-sized. A memo hit replays the
# merges as a chained literal ``replace`` projection (one corpus scan,
# zero actions) — deterministic because the merge list fully determines
# the chain (exactly the oracle's generated w{i} CTE replay). Corpus
# parquet is assumed immutable within a session (the unigram artifact
# semantics); tests monkeypatching ``T`` under a reused sf_dir must clear
# this.
_TRAIN_MEMO: dict[tuple[str, str, int], dict] = {}


def _memo_slot(spark, sf_dir, n_merges: int) -> dict:
    key = (spark.sparkContext.applicationId, sf_dir, int(n_merges))
    return _TRAIN_MEMO.setdefault(key, {})


def _wp_words_frame(spark, sf_dir):
    docs = spread(T(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(F.expr(_TOKENS)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("seq", _w0_col(F.col("word")))
    )


def _train_wordpiece(spark, sf_dir, n_merges: int = N_WP_MERGES):
    """Run the trainer (or replay the session-memoized merge list);
    returns (merge list, final persisted word frame).
    Caller must ``unpersist`` the returned frame when done."""
    slot = _memo_slot(spark, sf_dir, n_merges)
    if "merges" in slot:
        cur = _wp_words_frame(spark, sf_dir)
        for _step, lhs, rhs, merged, _c, _s in slot["merges"]:
            cur = cur.withColumn(
                "seq",
                F.expr(f"replace(seq, ' {lhs}  {rhs} ', ' {merged} ')"),
            )
        return list(slot["merges"]), cur.transform(persisted)
    words = _wp_words_frame(spark, sf_dir).transform(persisted)
    merges = []
    cur, prev = words, None
    for step in range(1, n_merges + 1):
        sy = cur.select("n", F.split(F.trim("seq"), " +").alias("sy"))
        syms = sy.select(
            "n", F.explode("sy").alias("sym")
        ).groupBy("sym").agg(F.sum("n").cast("bigint").alias("uc"))
        pairs = (
            sy.select(
                "n",
                F.explode(
                    F.expr(
                        "if(size(sy) < 2, "
                        "cast(array() as array<struct<l string, r string>>), "
                        "transform(sequence(1, size(sy) - 1), "
                        "i -> struct(element_at(sy, i) AS l, "
                        "element_at(sy, i + 1) AS r)))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
            .agg(F.sum("n").cast("bigint").alias("c"))
        )
        scored = (
            pairs.join(
                F.broadcast(syms.withColumnsRenamed({"sym": "lhs", "uc": "cl"})),
                "lhs",
            )
            .join(
                F.broadcast(syms.withColumnsRenamed({"sym": "rhs", "uc": "cr"})),
                "rhs",
            )
            .withColumn(
                "score_fp18",
                F.expr(
                    f"CAST(CAST(c AS DECIMAL(38,0)) * {_FP} "
                    "div (CAST(cl AS DECIMAL(38,0)) * cr) AS BIGINT)"
                ),
            )
        )
        # the ONE action per round: a 1-row driver argmax (the plans/bpe.py
        # discipline); materializes `cur`'s cache as a side effect
        best = scored.orderBy(
            F.desc("score_fp18"), F.desc("c"), "lhs", "rhs"
        ).first()
        if prev is not None:
            prev.unpersist()
        if best is None:  # exhausted: every word fully merged
            break
        merged = best["lhs"] + (
            best["rhs"][2:] if best["rhs"].startswith("##") else best["rhs"]
        )
        merges.append(
            (step, best["lhs"], best["rhs"], merged, best["c"], best["score_fp18"])
        )
        nxt = cur.withColumn(
            "seq",
            F.expr(
                "replace(seq, ' {l}  {r} ', ' {m} ')".format(
                    l=best["lhs"], r=best["rhs"], m=merged
                )
            ),
        ).persist()
        cur, prev = nxt, cur
    if prev is not None:
        prev.unpersist()
    slot["merges"] = [tuple(m) for m in merges]
    return merges, cur


_TRAIN_ORACLE = (
    _wp_cte_chain(N_WP_MERGES)
    + "\n"
    + " UNION ALL ".join(
        f"SELECT {i + 1} AS step, lhs, rhs, merged, c AS pair_count, "
        f"score_fp18 FROM b{i}"
        for i in range(N_WP_MERGES)
    )
)


@register("q_wordpiece_train_merges", oracle=_TRAIN_ORACLE)
def q_wordpiece_train_merges(spark, sf_dir):
    """Train the first {n} WordPiece merges on the document corpus; returns
    the merge table (step, lhs, rhs, merged, pair_count, score_fp18) — the
    artifact a BERT-style tokenizer ships. Module docstring: exact-integer
    likelihood-score argmax, ## continuation convention, scale story.""".format(
        n=N_WP_MERGES
    )
    merges, final = _train_wordpiece(spark, sf_dir)
    final.unpersist()
    return spark.createDataFrame(
        merges,
        "step int, lhs string, rhs string, merged string, "
        "pair_count bigint, score_fp18 bigint",
    )


def _encode_chain(n_merges: int) -> str:
    """Oracle mirror of the greedy longest-match unroll: vocab = alphabet
    ∪ merged tokens; _LMAX levels of (active-state × candidate-length)
    equi-join to the vocabulary, advancing by max matched length."""
    merged_union = " UNION ".join(
        f"SELECT merged AS piece FROM b{i}" for i in range(n_merges)
    )
    levels = []
    for level in range(1, _LMAX + 1):
        a, prev = f"a{level}", f"a{level - 1}"
        levels.append(f"""
m{level} AS MATERIALIZED (
  SELECT c.word, CAST(MAX(c.j) AS INT) AS adv
  FROM (
    SELECT a.word, a.pos, CAST(j AS INT) AS j,
           CASE WHEN a.pos = 0 THEN substr(a.word, 1, CAST(j AS INT))
                ELSE '##' || substr(a.word, a.pos + 1, CAST(j AS INT)) END
             AS cand
    FROM {prev} a, UNNEST(range(1, {_LMAX} + 1)) AS t(j)
    WHERE NOT a.done AND j <= len(a.word) - a.pos
  ) c JOIN vocab v ON v.piece = c.cand
  GROUP BY c.word
),
{a} AS MATERIALIZED (
  SELECT word, pos, k, unk, done FROM {prev} WHERE done
  UNION ALL
  SELECT a.word,
         a.pos + COALESCE(m.adv, 0) AS pos,
         a.k + CASE WHEN m.adv IS NULL THEN 0 ELSE 1 END AS k,
         (m.adv IS NULL) AS unk,
         (m.adv IS NULL OR a.pos + m.adv >= len(a.word)) AS done
  FROM {prev} a LEFT JOIN m{level} m USING (word)
  WHERE NOT a.done
)""")
    return f"""
vocab AS MATERIALIZED (
  SELECT DISTINCT t AS piece
  FROM (SELECT unnest(string_split_regex(trim(seq), '\\s+')) AS t FROM w0)
  UNION
  {merged_union}
),
a0 AS (
  SELECT word, 0 AS pos, 0 AS k, FALSE AS unk, len(word) = 0 AS done
  FROM words WHERE len(word) <= {_LMAX}
),
{", ".join(levels)},
wp AS (
  SELECT word,
         CASE WHEN unk THEN CAST(1 AS BIGINT) ELSE CAST(k AS BIGINT) END
           AS n_pieces,
         CAST(CASE WHEN unk THEN 1 ELSE 0 END AS BIGINT) AS is_unk
  FROM a{_LMAX}
)"""


_ENCODE_ORACLE = f"""{_wp_cte_chain(N_WP_MERGES)},
{_encode_chain(N_WP_MERGES)},
doc_tokens AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
  ) WHERE len(word) <= {_LMAX} AND word <> ''
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_pieces) AS BIGINT) AS n_wp_tokens,
       CAST(SUM(w.is_unk) AS BIGINT) AS n_unk_words
FROM doc_tokens d JOIN wp w USING (word)
GROUP BY d.doc_id
"""


def _wp_word_pieces(spark, sf_dir):
    """Train + greedy-encode the distinct-word frame; returns the
    persisted ``(word, n, n_pieces, is_unk)`` frame — the shared seam for
    :func:`q_wordpiece_encode` and the tokenizer shoot-out capstone."""
    # vocabulary: initial alphabet (symbols of w0) ∪ merged tokens —
    # alphabet is ≤ 2·|charset| rows, merges ≤ N_WP_MERGES: broadcast-sized.
    # Both live in the session memo, so a warm call skips the trainer AND
    # the alphabet scan entirely; on the first call the alphabet is
    # COLLECTED from the still-persisted trained frame BEFORE
    # final.unpersist() — unpersisting first made the first vocabulary
    # evaluation recompute the whole training lineage (ADVICE r11 #2).
    slot = _memo_slot(spark, sf_dir, N_WP_MERGES)
    if "alpha" in slot and "merges" in slot:
        merges, alpha_rows = slot["merges"], slot["alpha"]
    else:
        merges, final = _train_wordpiece(spark, sf_dir)
        alpha_rows = sorted(
            r["piece"]
            for r in final.select(
                F.explode(
                    F.split(F.trim(_w0_col(F.col("word"))), " +")
                ).alias("piece")
            )
            .distinct()
            .collect()
        )
        final.unpersist()
        slot["alpha"] = alpha_rows
    words = (
        spread(T(spark, sf_dir, "documents"))
        .select(F.explode(F.expr(_TOKENS)).alias("word"))
        .filter((F.length("word") > 0) & (F.length("word") <= _LMAX))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .transform(persisted)
    )
    pieces = sorted(set(alpha_rows) | {m[3] for m in merges})

    # r12 optimization (guide §4.2): the greedy longest-match used to run as
    # up to _LMAX eager-localCheckpoint levels (each an explode + broadcast
    # vocab join + argmax + isEmpty probe — ~24 serialized driver-blocking
    # jobs on the word frame). Greedy WordPiece inference over a
    # config-BOUNDED vocabulary (`pieces`: alphabet + N_WP_MERGES tokens,
    # already a Python list here) is per-word-independent, so it now runs as
    # ONE Arrow-vectorized pass over the distinct-word frame. Semantics are
    # the level loop's, verbatim: at each position take the LONGEST j ≤
    # min(_LMAX, remaining) whose candidate (word-initial piece at pos 0,
    # '##'-piece after) is in the vocabulary; advance; a miss makes the
    # whole word [UNK] (n_pieces=1, is_unk=1). Identical oracle hashes;
    # measured at sf0.1 in OPTIMIZATION_r12.md.
    vocab_set = frozenset(pieces)

    def _greedy(word):
        ln = len(word)
        pos = 0
        k = 0
        while pos < ln:
            adv = 0
            for j in range(min(_LMAX, ln - pos), 0, -1):
                cand = word[: j] if pos == 0 else "##" + word[pos : pos + j]
                if cand in vocab_set:
                    adv = j
                    break
            if adv == 0:
                return (1, 1)
            k += 1
            pos += adv
        return (k, 0)

    @F.pandas_udf("n_pieces bigint, is_unk bigint")
    def _wp_greedy(batch: pd.Series) -> pd.DataFrame:
        out = [_greedy(w) for w in batch]
        return pd.DataFrame(out, columns=["n_pieces", "is_unk"])

    return (
        words.select("word", "n", _wp_greedy("word").alias("g"))
        .select("word", "n", F.col("g.n_pieces").alias("n_pieces"), F.col("g.is_unk").alias("is_unk"))
        .transform(persisted)
    )


@register("q_wordpiece_encode", oracle=_ENCODE_ORACLE)
def q_wordpiece_encode(spark, sf_dir):
    """Apply the trained WordPiece vocabulary corpus-wide with REAL
    WordPiece inference — greedy longest-match-first (not a training-
    segmentation replay): per document, the word count, total WordPiece
    token count, and [UNK] word count. The greedy DP runs on the
    DISTINCT-word frame against the broadcast vocabulary and maps onto
    the corpus by ONE word-keyed join (the q_bpe_encode /
    q_unigram_encode artifact-application shape)."""
    wp = _wp_word_pieces(spark, sf_dir)
    docs = spread(T(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS)).alias("word")
    ).filter((F.length("word") > 0) & (F.length("word") <= _LMAX))
    return (
        tok.join(wp, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_wp_tokens"),
            F.sum("is_unk").cast("bigint").alias("n_unk_words"),
        )
    )
