"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016), fully
oracle-checked.

The trainer is the classic word-level BPE: count corpus words once, represent
each word as space-separated symbols (characters + a ``</w>`` terminal),
then repeatedly (a) count adjacent symbol pairs weighted by word frequency,
(b) pick the most frequent pair (count DESC, then lexicographic — exact
integer tiebreak), (c) merge every greedy left-to-right occurrence.

Cross-engine exactness hinges on one trick: symbols joined by DOUBLE spaces
with double-space padding (``  h  e  l  l  o  </w>  ``) let the merge step
be a plain ``replace(seq, ' a  b ', ' ab ')`` — non-overlapping
left-to-right string replacement, identical in Spark and DuckDB, and
equivalent to greedy BPE merging: each pattern occurrence consumes only
HALF of each outer separator, so back-to-back pair occurrences (``a b a b``)
each keep a boundary space to match on (a single-space encoding silently
skips every second occurrence — caught by the property test against the
canonical symbol-list merger, tests/test_bpe.py). The single-space
replacement restores the double-separator invariant. No per-row Python, no
UDF: the whole trainer is string expressions plus one integer aggregation
per round.

Scale shape: the corpus is scanned ONCE (word counts); every round after
that runs on the distinct-word frame — one map-side-combined pair
aggregation (a shuffle of vocabulary-sized pair partials) plus a 1-row
argmax collected to the driver (the same O(1) driver probe as the
connected-components convergence check). 10 rounds = 10 vocab passes, zero
corpus passes. Production trainers checkpoint the word frame between rounds;
here the lineage is 10 ``replace`` projections deep, which Catalyst folds
into a single stage per round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, persisted, register, spread
from .search import _TOKS_SQL

N_MERGES = 10


# default (word-level) symbolization: chars + a </w> terminal. plans/bpe2.py
# passes byte-level alternatives through the same trainer/CTE machinery.
_W0_SQL_CHAR = (
    "'  ' || trim(regexp_replace(word, '(.)', '\\1  ', 'g')) || '  </w>  '"
)


def _char_seq(col):
    return F.concat(
        F.lit("  "),
        F.trim(F.regexp_replace(col, "(.)", "$1  ")),
        F.lit("  </w>  "),
    )


def _bpe_cte_chain(n_merges: int, w0_sql: str = _W0_SQL_CHAR) -> str:
    """The shared WITH-chain: word counts → w0 → (pairs, best, w{i+1})*."""
    rounds = []
    for i in range(n_merges):
        rounds.append(f"""
sy{i} AS (SELECT n, string_split_regex(trim(seq), '\\s+') AS toks FROM w{i}),
p{i} AS (
  SELECT p.l AS lhs, p.r AS rhs, CAST(SUM(n) AS BIGINT) AS c
  FROM (
    SELECT n, unnest(list_transform(range(1, len(toks)),
      i -> {{'l': toks[CAST(i AS INT)], 'r': toks[CAST(i + 1 AS INT)]}})) AS p
    FROM sy{i}
  ) GROUP BY p.l, p.r
),
b{i} AS (SELECT lhs, rhs, c FROM p{i} ORDER BY c DESC, lhs, rhs LIMIT 1),
w{i + 1} AS (
  -- LEFT JOIN ON TRUE: an exhausted round (no pairs left — tiny corpora
  -- fully merge) leaves seq unchanged instead of emptying the vocabulary
  SELECT word, n,
         COALESCE(replace(seq, ' ' || b.lhs || '  ' || b.rhs || ' ', ' ' || b.lhs || b.rhs || ' '), seq) AS seq
  FROM w{i} LEFT JOIN b{i} b ON TRUE
)""")
    return f"""
WITH tk AS (SELECT {_TOKS_SQL} AS toks FROM documents),
words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(toks) AS word FROM tk) GROUP BY word
),
w0 AS (
  SELECT word, n, {w0_sql} AS seq
  FROM words
),
{", ".join(rounds)}"""


def _bpe_oracle(n_merges: int) -> str:
    final = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, lhs, rhs, lhs || rhs AS merged, c AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return f"{_bpe_cte_chain(n_merges)}\n{final}\n"


# Session-scoped trained-artifact memo (VERDICT r11 #2; the unigram
# precedent, plans/unigram.py): a tokenizer is trained ONCE per session and
# then applied, but q_bpe_encode / q_bpe_fertility / q_bpe_roundtrip /
# q_tokenizer_shootout each re-ran the full N_MERGES trainer (N driver
# argmax actions over the pair frame). The memo keys on (applicationId,
# sf_dir, symbolization variant, n_merges) and stores the MERGE LIST —
# ≤ n_merges rows, a module-constant bound, never corpus-sized. A memo hit
# REPLAYS the merges as a literal chained-``replace`` projection over the
# word frame (one corpus scan, zero per-round actions) — deterministic
# because the merge list fully determines the replace chain (the same
# replay the oracle's generated w{i} CTEs perform). Assumption (documented
# artifact semantics, as for unigram): parquet under sf_dir is immutable
# within a session. Tests that monkeypatch ``T``/the corpus under a reused
# sf_dir must clear this.
_TRAIN_MEMO: dict[tuple[str, str, str, int], list] = {}


def _merge_replace_expr(lhs: str, rhs: str, merged: str) -> str:
    # symbols are drawn from the tokenizer charsets ([a-z0-9], '</w>',
    # 'B<dec>' byte names) — no quotes to escape
    return (
        f"replace(seq, ' ' || '{lhs}' || '  ' || '{rhs}' || ' ', "
        f"' ' || '{merged}' || ' ')"
    )


def _train_bpe(spark, sf_dir, n_merges: int, seq_builder=_char_seq,
               variant: str = "char"):
    """Run the trainer (or replay the session-memoized merge list); returns
    (merge list, final persisted word frame).

    ``seq_builder(word_col) -> Column`` produces the round-0 symbolization
    (default: char-level with a ``</w>`` terminal; byte-level in bpe2.py);
    ``variant`` names it in the memo key.
    Caller must ``unpersist`` the returned frame when done."""
    from ..operators.search import _TOKENS

    docs = spread(T(spark, sf_dir, "documents"))
    base = (
        docs.select(F.explode(F.expr(_TOKENS)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("seq", seq_builder(F.col("word")))
    )
    key = (spark.sparkContext.applicationId, sf_dir, variant, int(n_merges))
    memo = _TRAIN_MEMO.get(key)
    if memo is not None:
        cur = base
        for _step, lhs, rhs, merged, _c in memo:
            cur = cur.withColumn(
                "seq", F.expr(_merge_replace_expr(lhs, rhs, merged))
            )
        return [tuple(m) for m in memo], cur.transform(persisted)
    words = base.transform(persisted)
    merges = []
    cur, prev = words, None
    for step in range(1, n_merges + 1):
        pairs = (
            # Project the symbol array ONCE per row — element_at over an
            # attribute is O(1); inlining split() into the lambda would
            # re-split the string for every element (O(len²) per word).
            cur.select("n", F.split(F.trim("seq"), " +").alias("sy"))
            .select(
                "n",
                F.explode(
                    # guard the fully-merged single-symbol word: Spark's
                    # sequence(1, 0) runs DESCENDING (unlike DuckDB's empty
                    # range) and element_at(sy, 2) then throws — byte-level
                    # vocabularies hit this as soon as a 1-char word's
                    # (B32, byte) pair wins a merge round
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
        # The ONE action per round: the global argmax materializes (and
        # caches) `cur` as a side effect, so no explicit count() is needed.
        # `prev` is unpersisted only now — after `cur` is safely cached —
        # keeping every round's recompute lineage one step deep.
        best = pairs.orderBy(F.desc("c"), "lhs", "rhs").first()
        if prev is not None:
            prev.unpersist()
        if best is None:  # exhausted: every word fully merged (tiny corpora)
            break
        merges.append((step, best["lhs"], best["rhs"], best["lhs"] + best["rhs"], best["c"]))
        nxt = cur.withColumn(
            "seq",
            F.expr(
                "replace(seq, ' ' || {l} || '  ' || {r} || ' ', ' ' || {l} || {r} || ' ')".format(
                    l=f"'{best['lhs']}'", r=f"'{best['rhs']}'"
                )
            ),
        ).persist()
        cur, prev = nxt, cur
    if prev is not None:
        prev.unpersist()
    _TRAIN_MEMO[key] = [tuple(m) for m in merges]
    return merges, cur


@register("q_bpe_train_merges", oracle=_bpe_oracle(N_MERGES))
def q_bpe_train_merges(spark, sf_dir):
    """Train the first {n} BPE merges on the document corpus; returns the
    merge table (step, lhs, rhs, merged, pair_count) — the artifact a
    tokenizer ships. See module docstring for the exact-parity and scale
    story.""".format(n=N_MERGES)
    merges, final = _train_bpe(spark, sf_dir, N_MERGES)
    final.unpersist()
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, pair_count bigint"
    )


def _encode_oracle(n_merges: int) -> str:
    # Reuse the trainer's CTE chain, then re-tokenize the corpus and join
    # each token against the trained word→segmentation map.
    return f"""{_bpe_cte_chain(n_merges)}
, vocab AS (
  SELECT word, len(string_split_regex(trim(seq), '\\s+')) AS n_sym FROM w{n_merges}
),
doc_tokens AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_sym) AS BIGINT) AS n_bpe_tokens
FROM doc_tokens d JOIN vocab v USING (word)
GROUP BY d.doc_id
"""


@register("q_bpe_encode", oracle=_encode_oracle(N_MERGES))
def q_bpe_encode(spark, sf_dir):
    """Apply the trained merges corpus-wide: per-document BPE token count
    (the number a context-window packer actually budgets against). The
    trained word→segmentation map is vocabulary-sized, so encoding is one
    corpus tokenize joined against the vocab on the word key and a per-doc
    aggregate — the corpus never re-runs the merge loop; that is exactly how
    a shipped tokenizer artifact is applied at 100 TB."""
    from ..operators.search import _TOKENS

    _, final = _train_bpe(spark, sf_dir, N_MERGES)
    vocab = final.select(
        "word", F.size(F.split(F.trim("seq"), " +")).alias("n_sym")
    )
    docs = spread(T(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("word"))
    out = (
        tok.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
        )
    )
    return out


def _fertility_oracle(n_merges: int) -> str:
    return f"""{_bpe_cte_chain(n_merges)}
, vocab AS (
  SELECT word, len(string_split_regex(trim(seq), '\\s+')) AS n_sym FROM w{n_merges}
),
occ AS (
  SELECT source, unnest({_TOKS_SQL}) AS word FROM documents
)
SELECT o.source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(CASE WHEN v.n_sym = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_token,
       CAST(floor(SUM(v.n_sym) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS fertility_fp6
FROM occ o JOIN vocab v USING (word)
GROUP BY o.source
"""


@register("q_bpe_fertility", oracle=_fertility_oracle(N_MERGES))
def q_bpe_fertility(spark, sf_dir):
    """Tokenizer FERTILITY per source (mean BPE tokens per word — the
    standard tokenizer-quality metric; fertility near 1 means the vocab
    serves that source well, high fertility flags domains the tokenizer
    fragments and therefore over-charges in context budget). Same shipped-
    artifact application shape as q_bpe_encode: the vocabulary-sized
    word→symbol-count map joins the corpus tokens on the word key; one
    corpus tokenize, per-source aggregates, merge loop never re-runs."""
    from ..operators.search import _TOKENS

    _, final = _train_bpe(spark, sf_dir, N_MERGES)
    vocab = final.select(
        "word", F.size(F.split(F.trim("seq"), " +")).alias("n_sym")
    )
    docs = spread(T(spark, sf_dir, "documents"))
    occ = docs.select("source", F.explode(F.expr(_TOKENS)).alias("word"))
    return (
        occ.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.when(F.col("n_sym") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_single_token"),
            F.floor(F.sum("n_sym") * 1_000_000.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("fertility_fp6"),
        )
    )


@register(
    "q_bpe_roundtrip",
    oracle=f"""{_bpe_cte_chain(N_MERGES)}
, audit AS (
  SELECT word, n,
         len(string_split_regex(trim(seq), '\\s+')) AS n_sym,
         CASE WHEN replace(replace(seq, ' ', ''), '</w>', '') = word
              THEN 1 ELSE 0 END AS lossless
  FROM w{N_MERGES}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(lossless) AS BIGINT) AS n_lossless,
       CAST(COUNT(*) - SUM(lossless) AS BIGINT) AS n_lossy,
       CAST(SUM(n * n_sym) AS BIGINT) AS corpus_tokens,
       CAST(SUM(n * len(word)) AS BIGINT) AS corpus_chars,
       CAST(floor(SUM(n * n_sym) * 1000000.0 / SUM(n * len(word))) AS BIGINT)
         AS tokens_per_char_fp6
FROM audit
""",
)
def q_bpe_roundtrip(spark, sf_dir):
    """Tokenizer round-trip audit — the invariant a BPE artifact must hold
    before it ships: stripping separators (and the ``</w>`` terminal) from
    every trained segmentation must reproduce the original word EXACTLY, for
    the whole vocabulary (``n_lossy`` = 0, enforced by test). Also reports
    corpus-weighted compression (BPE tokens per character) — the number that
    tells you whether the merge budget was worth it.

    Scale shape: the audit runs entirely on the VOCABULARY frame (the merge
    loop's output, thousands of rows at any corpus size) — zero additional
    corpus passes; string equality is exact in both engines."""
    _, final = _train_bpe(spark, sf_dir, N_MERGES)
    audit = final.select(
        "word",
        "n",
        F.size(F.split(F.trim("seq"), " +")).cast("bigint").alias("n_sym"),
        F.when(
            F.regexp_replace(F.regexp_replace("seq", " ", ""), "</w>", "")
            == F.col("word"),
            1,
        )
        .otherwise(0)
        .alias("lossless"),
    )
    return audit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("lossless").cast("bigint").alias("n_lossless"),
        (F.count(F.lit(1)) - F.sum("lossless")).cast("bigint").alias("n_lossy"),
        F.sum(F.col("n") * F.col("n_sym")).cast("bigint").alias("corpus_tokens"),
        F.sum(F.col("n") * F.length("word")).cast("bigint").alias("corpus_chars"),
        F.floor(
            F.sum(F.col("n") * F.col("n_sym"))
            * 1_000_000.0
            / F.sum(F.col("n") * F.length("word"))
        )
        .cast("bigint")
        .alias("tokens_per_char_fp6"),
    )
