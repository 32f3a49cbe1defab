"""Byte-level BPE (GPT-2-style) training, encoding, and artifact parity.

``plans/bpe.py`` trains the classic word-level BPE (chars + ``</w>``).
Modern LLM tokenizers are BYTE-level (Radford et al., GPT-2; Sennrich-style
merges over byte symbols): the base alphabet is the 256 byte values so no
word is ever out-of-vocabulary, and the leading-space convention (GPT-2's
``Ġ``) is a literal space byte prefixed to every word. This module re-runs
the SAME double-space merge machinery (see bpe.py module docstring for the
exactness argument) over byte symbols ``B{code}``: a word symbolizes as
``B32 B104 B101 ...`` (the B32 = the space-prefix marker).

Three audits ride the encode query, because they are what a tokenizer
artifact must prove before it ships:

* **replay parity** — the Spark side re-applies the COLLECTED merge list
  (the artifact: 8 (lhs, rhs) rows that round-tripped through the driver,
  exactly how a shipped tokenizer applies merges) to a fresh round-0
  symbolization and counts words whose replayed segmentation differs from
  the trained one. Must be 0: training state and artifact application are
  the same function.
* **byte round-trip** — decoding every trained segmentation (strip
  separators, map each ``B{code}`` back through ``char()``) must reproduce
  ``' ' || word`` exactly, for the whole vocabulary.
* **fertility / compression** — byte-tokens per word and per byte, the
  numbers a context-window budget is planned against.

Scale shape: identical to the word-level family — the corpus is scanned
once for word counts; every merge round runs on the distinct-word frame
(one map-side-combined pair aggregation + a 1-row argmax driver probe);
encoding joins corpus tokens against the vocabulary-sized word→n_sym map.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .bpe import _bpe_cte_chain, _train_bpe
from .registry import T, register, spread
from .search import _TOKS_SQL

N_BYTE_MERGES = 8

# round-0 byte symbolization, as SQL in both engines
_W0_SQL_BYTE = (
    "'  B32  ' || array_to_string(list_transform(range(1, len(word) + 1), "
    "i -> 'B' || ascii(word[CAST(i AS INT)])), '  ') || '  '"
)
_W0_SPARK_BYTE = (
    "concat('  B32  ', array_join(transform(sequence(1, length(word)), "
    "i -> concat('B', ascii(substring(word, i, 1)))), '  '), '  ')"
)


def _byte_seq(col):  # the trainer frame names its token column `word`
    return F.expr(_W0_SPARK_BYTE)


def _train_byte_bpe(spark, sf_dir):
    return _train_bpe(
        spark, sf_dir, N_BYTE_MERGES, seq_builder=_byte_seq, variant="byte"
    )


def _byte_train_oracle(n: int) -> str:
    final = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, lhs, rhs, lhs || rhs AS merged, c AS pair_count FROM b{i}"
        for i in range(n)
    )
    return f"{_bpe_cte_chain(n, w0_sql=_W0_SQL_BYTE)}\n{final}\n"


@register("q_bpe_byte_train", oracle=_byte_train_oracle(N_BYTE_MERGES))
def q_bpe_byte_train(spark, sf_dir):
    """Train the first {n} BYTE-level merges; returns the merge table
    (step, lhs, rhs, merged, pair_count) — the artifact a byte-level
    tokenizer ships. Same trainer loop as q_bpe_train_merges with the
    byte-symbol round-0 (no OOV possible: the base alphabet is bytes).
    """.format(n=N_BYTE_MERGES)
    merges, final = _train_byte_bpe(spark, sf_dir)
    final.unpersist()
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, pair_count bigint"
    )


_DECODE_DUCK = (
    "array_to_string(list_transform("
    "regexp_extract_all(replace(trim(seq), ' ', ''), 'B(\\d+)', 1), "
    "c -> chr(CAST(c AS INT))), '')"
)
_DECODE_SPARK = (
    "array_join(transform("
    "regexp_extract_all(replace(trim(seq), ' ', ''), 'B(\\\\d+)', 1), "
    "c -> char(cast(c as int))), '')"
)

_BYTE_ENCODE_ORACLE = f"""{_bpe_cte_chain(N_BYTE_MERGES, w0_sql=_W0_SQL_BYTE)}
, vocab AS (
  SELECT word, n,
         len(string_split_regex(trim(seq), '\\s+')) AS n_sym,
         CASE WHEN {_DECODE_DUCK} = ' ' || word THEN 0 ELSE 1 END AS decode_bad
  FROM w{N_BYTE_MERGES}
),
audit AS (
  SELECT CAST(SUM(decode_bad) AS BIGINT) AS decode_lossy,
         CAST(0 AS BIGINT) AS replay_lossy
  FROM vocab
),
occ AS (
  SELECT source, unnest({_TOKS_SQL}) AS word FROM documents
)
SELECT o.source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(o.word) + 1) AS BIGINT) AS n_bytes,
       CAST(SUM(v.n_sym) AS BIGINT) AS n_byte_tokens,
       CAST(floor(SUM(v.n_sym) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS byte_fertility_fp6,
       CAST(floor(SUM(v.n_sym) * 1000000.0 / SUM(len(o.word) + 1)) AS BIGINT)
         AS tokens_per_byte_fp6,
       a.replay_lossy, a.decode_lossy
FROM occ o JOIN vocab v USING (word), audit a
GROUP BY o.source, a.replay_lossy, a.decode_lossy
"""


@register("q_bpe_byte_encode", oracle=_BYTE_ENCODE_ORACLE)
def q_bpe_byte_encode(spark, sf_dir):
    """Apply the trained byte-level merges corpus-wide, with the two
    artifact audits in-plan (module docstring): per source, word/byte/token
    mass and fertility, plus ``replay_lossy`` (collected merge list
    re-applied to a fresh round-0 symbolization must reproduce the trained
    segmentation for every vocabulary word) and ``decode_lossy`` (B-code
    decode must reproduce ``' ' || word``).

    The oracle's replay is structurally 0 (its replay IS the training
    chain); the Spark replay is the REAL witness — the merge list
    round-trips through the driver as 8 plain tuples, exactly the shipped-
    artifact path, and re-applies as 8 chained ``replace`` projections on
    the vocabulary frame (never the corpus)."""
    merges, final = _train_byte_bpe(spark, sf_dir)
    replayed = final.withColumn("seq_r", F.expr(_W0_SPARK_BYTE))
    for _, lhs, rhs, _, _ in merges:
        replayed = replayed.withColumn(
            "seq_r",
            F.expr(
                "replace(seq_r, ' ' || '{l}' || '  ' || '{r}' || ' ', "
                "' ' || '{l}{r}' || ' ')".format(l=lhs, r=rhs)
            ),
        )
    vocab = replayed.select(
        "word",
        F.size(F.split(F.trim("seq"), " +")).alias("n_sym"),
        F.when(F.expr(_DECODE_SPARK) == F.concat(F.lit(" "), F.col("word")), 0)
        .otherwise(1)
        .alias("decode_bad"),
        F.when(F.col("seq_r") == F.col("seq"), 0).otherwise(1).alias("replay_bad"),
    )
    audit = vocab.agg(
        F.sum("replay_bad").cast("bigint").alias("replay_lossy"),
        F.sum("decode_bad").cast("bigint").alias("decode_lossy"),
    )
    from ..operators.search import _TOKENS

    docs = spread(T(spark, sf_dir, "documents"))
    occ = docs.select("source", F.explode(F.expr(_TOKENS)).alias("word"))
    per_source = (
        occ.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word") + 1).cast("bigint").alias("n_bytes"),
            F.sum("n_sym").cast("bigint").alias("n_byte_tokens"),
            F.floor(F.sum("n_sym") * 1_000_000.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("byte_fertility_fp6"),
            F.floor(
                F.sum("n_sym") * 1_000_000.0 / F.sum(F.length("word") + 1)
            )
            .cast("bigint")
            .alias("tokens_per_byte_fp6"),
        )
    )
    out = per_source.crossJoin(F.broadcast(audit)).select(
        "source",
        "n_words",
        "n_bytes",
        "n_byte_tokens",
        "byte_fertility_fp6",
        "tokens_per_byte_fp6",
        "replay_lossy",
        "decode_lossy",
    )
    return out


# ---------------------------------------------------------------------------
# Vocabulary-size economics: tokens-per-byte at PREFIXES of one merge run.
# ---------------------------------------------------------------------------

SWEEP_CHECKPOINTS = [0, 2, 4, N_BYTE_MERGES]


def _sweep_agg_sql(k: int) -> str:
    return f"""
agg{k} AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_words,
         CAST(SUM(n * (len(word) + 1)) AS BIGINT) AS n_bytes,
         CAST(SUM(n * len(string_split_regex(trim(seq), '\\s+'))) AS BIGINT)
           AS n_byte_tokens
  FROM w{k}
)"""


def _sweep_oracle() -> str:
    aggs = ",".join(_sweep_agg_sql(k) for k in SWEEP_CHECKPOINTS)
    rows = []
    for i, k in enumerate(SWEEP_CHECKPOINTS):
        prev = SWEEP_CHECKPOINTS[i - 1] if i else None
        saved = (
            f"agg{prev}.n_byte_tokens - agg{k}.n_byte_tokens" if i else "0"
        )
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS n_merges,"
            f" agg{k}.n_words, agg{k}.n_bytes, agg{k}.n_byte_tokens,"
            f" CAST(floor(agg{k}.n_byte_tokens * 1000000.0 / agg{k}.n_bytes) AS BIGINT)"
            f"   AS tokens_per_byte_fp6,"
            f" CAST(floor(agg{k}.n_byte_tokens * 1000000.0 / agg{k}.n_words) AS BIGINT)"
            f"   AS byte_fertility_fp6,"
            f" CAST({saved} AS BIGINT) AS saved_vs_prev_tokens,"
            f" CAST(0 AS BIGINT) AS replay_lossy"
            f" FROM {', '.join('agg' + str(c) for c in SWEEP_CHECKPOINTS)}"
        )
        # referencing every aggN keeps each SELECT a pure cross join of
        # 1-row frames — saved_vs_prev needs the previous checkpoint
    final = " UNION ALL ".join(rows)
    return (
        f"{_bpe_cte_chain(N_BYTE_MERGES, w0_sql=_W0_SQL_BYTE)},{aggs}\n{final}\n"
    )


@register("q_bpe_vocab_sweep", oracle=_sweep_oracle())
def q_bpe_vocab_sweep(spark, sf_dir):
    """Tokenizer VOCABULARY-SIZE ECONOMICS (VERDICT r07 #6): tokens-per-byte
    at merge-count checkpoints {cps}, all replayed from ONE training run's
    merge sequence — the curve a tokenizer-budget decision is made from
    (every checkpoint shares the prefix property of BPE merge lists, so one
    trained artifact prices every smaller vocabulary for free).

    The corpus is scanned ONCE (by the trainer, for word counts); the sweep
    itself runs entirely on the distinct-word vocabulary frame: checkpoint
    k's segmentation is the first k collected merges re-applied as chained
    ``replace`` projections to a fresh round-0 symbolization — the same
    shipped-artifact replay path as ``q_bpe_byte_encode``, so the k = {n}
    checkpoint doubles as a replay-parity witness (``replay_lossy`` must be
    0 against the trained frame). Token masses are occurrence-weighted by
    the vocab frame's word counts — no second corpus pass.
    """.format(cps=SWEEP_CHECKPOINTS, n=N_BYTE_MERGES)
    merges, final = _train_byte_bpe(spark, sf_dir)
    seqs = final.withColumn("seq_k", F.expr(_W0_SPARK_BYTE))
    checkpoints = set(SWEEP_CHECKPOINTS)
    if 0 in checkpoints:
        seqs = seqs.withColumn("nsym_0", F.size(F.split(F.trim("seq_k"), " +")))
    for step, lhs, rhs, _, _ in merges:
        seqs = seqs.withColumn(
            "seq_k",
            F.expr(
                "replace(seq_k, ' ' || '{l}' || '  ' || '{r}' || ' ', "
                "' ' || '{l}{r}' || ' ')".format(l=lhs, r=rhs)
            ),
        )
        if step in checkpoints:
            seqs = seqs.withColumn(
                f"nsym_{step}", F.size(F.split(F.trim("seq_k"), " +"))
            )
    # replay-parity witness at the full checkpoint: prefix replay of ALL
    # merges must reproduce the trained segmentation word-for-word
    seqs = seqs.withColumn(
        "replay_bad", F.when(F.col("seq_k") == F.col("seq"), 0).otherwise(1)
    )
    ks = sorted(checkpoints)
    agg = seqs.agg(
        F.sum("n").cast("bigint").alias("n_words"),
        F.sum(F.col("n") * (F.length("word") + 1)).cast("bigint").alias("n_bytes"),
        *[
            F.sum(F.col("n") * F.col(f"nsym_{k}")).cast("bigint").alias(f"t_{k}")
            for k in ks
        ],
        F.sum("replay_bad").cast("bigint").alias("rl"),  # vocab words, unweighted
    )
    final.unpersist()
    structs = []
    for i, k in enumerate(ks):
        prev = ks[i - 1] if i else None
        structs.append(
            F.struct(
                F.lit(k).cast("bigint").alias("n_merges"),
                F.col("n_words"),
                F.col("n_bytes"),
                F.col(f"t_{k}").alias("n_byte_tokens"),
                F.floor(F.col(f"t_{k}") * 1_000_000.0 / F.col("n_bytes"))
                .cast("bigint")
                .alias("tokens_per_byte_fp6"),
                F.floor(F.col(f"t_{k}") * 1_000_000.0 / F.col("n_words"))
                .cast("bigint")
                .alias("byte_fertility_fp6"),
                (
                    (F.col(f"t_{prev}") - F.col(f"t_{k}"))
                    if i
                    else F.lit(0)
                )
                .cast("bigint")
                .alias("saved_vs_prev_tokens"),
                (F.col("rl") if k == N_BYTE_MERGES else F.lit(0))
                .cast("bigint")
                .alias("replay_lossy"),
            )
        )
    return agg.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Artifact export/import parity: the shipped vocab.json + merges.txt files.
# ---------------------------------------------------------------------------


def export_bpe_artifact(merges: list, artifact_dir: str) -> dict:
    """Write the trained byte-BPE artifact the way tokenizers ship it:
    ``merges.txt`` (one ``lhs rhs`` line per merge, rank order) and
    ``vocab.json`` (symbol → contiguous id: the 256 base byte symbols
    ``B0..B255`` first, then each merge's output in rank order, skipping a
    merged symbol already present). Returns the vocab dict."""
    import json
    import os

    os.makedirs(artifact_dir, exist_ok=True)
    with open(os.path.join(artifact_dir, "merges.txt"), "w") as f:
        for _, lhs, rhs, _, _ in merges:
            f.write(f"{lhs} {rhs}\n")
    vocab = {f"B{i}": i for i in range(256)}
    for _, lhs, rhs, _, _ in merges:
        sym = lhs + rhs
        if sym not in vocab:
            vocab[sym] = len(vocab)
    with open(os.path.join(artifact_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    return vocab


def import_bpe_artifact(artifact_dir: str) -> tuple[list, dict]:
    """Read the artifact back: (merge list [(lhs, rhs)...], vocab dict)."""
    import json
    import os

    with open(os.path.join(artifact_dir, "merges.txt")) as f:
        merges = [tuple(line.split()) for line in f if line.strip()]
    with open(os.path.join(artifact_dir, "vocab.json")) as f:
        vocab = json.load(f)
    return merges, vocab


def apply_merge_list(df, merges: list, col: str):
    """Re-apply an (lhs, rhs) merge list to a symbolization column — the
    shipped-artifact encode path (chained replace projections, double-space
    separator discipline identical to training)."""
    for lhs, rhs in merges:
        df = df.withColumn(
            col,
            F.expr(
                "replace({c}, ' ' || '{l}' || '  ' || '{r}' || ' ', "
                "' ' || '{l}{r}' || ' ')".format(c=col, l=lhs, r=rhs)
            ),
        )
    return df


_ARTIFACT_ORACLE = f"""{_bpe_cte_chain(N_BYTE_MERGES, w0_sql=_W0_SQL_BYTE)}
, m AS ({" UNION ALL ".join(f"SELECT lhs, rhs, lhs || rhs AS merged FROM b{i}" for i in range(N_BYTE_MERGES))})
SELECT CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_merges_exported,
       CAST(256 + (SELECT COUNT(DISTINCT merged) FROM m) AS BIGINT)
         AS n_vocab_entries,
       CAST((SELECT COUNT(*) FROM w{N_BYTE_MERGES}) AS BIGINT) AS n_vocab_words,
       CAST(0 AS BIGINT) AS import_replay_lossy,
       CAST(0 AS BIGINT) AS oov_after_import,
       CAST(1 AS BIGINT) AS ids_contiguous_ok
"""


@register("q_bpe_artifact_roundtrip", oracle=_ARTIFACT_ORACLE)
def q_bpe_artifact_roundtrip(spark, sf_dir):
    """Tokenizer ARTIFACT export/import parity (r09, VERDICT r08 next-round
    #6): real pipelines don't re-train — they ship ``vocab.json`` +
    ``merges.txt``. This query trains, EXPORTS those two files to disk,
    RE-IMPORTS them, re-encodes the vocabulary from the imported merge
    list, and asserts IN-PLAN that the shipped artifact reproduces the
    trained tokenizer exactly:

    * ``n_merges_exported`` / ``n_vocab_entries`` — real counts read back
      from the files; the oracle independently re-derives them from its
      own training chain (256 base byte symbols + distinct merge outputs),
      so a truncated or duplicated artifact hash-mismatches.
    * ``import_replay_lossy`` — words whose file-driven re-encoding
      differs from the trained segmentation (must be 0: the artifact IS
      the tokenizer).
    * ``oov_after_import`` — re-encoded symbols missing from the imported
      vocab.json (must be 0: every emitted token has an id).
    * ``ids_contiguous_ok`` — imported ids are exactly 0..n_vocab-1 (the
      embedding-matrix contract).

    The negative control (a tampered artifact must flip the witnesses)
    lives in tests/test_round9_ops.py."""
    import tempfile

    merges, final = _train_byte_bpe(spark, sf_dir)
    artifact_dir = tempfile.mkdtemp(prefix="bpe_artifact_")
    export_bpe_artifact(merges, artifact_dir)
    imported_merges, imported_vocab = import_bpe_artifact(artifact_dir)

    replayed = final.withColumn("seq_i", F.expr(_W0_SPARK_BYTE))
    replayed = apply_merge_list(replayed, imported_merges, "seq_i")
    vocab_map = F.create_map(
        *[F.lit(x) for kv in imported_vocab.items() for x in kv]
    )
    checked = replayed.select(
        "word",
        F.when(F.col("seq_i") == F.col("seq"), 0).otherwise(1).alias("replay_bad"),
        F.size(
            F.filter(
                F.transform(
                    F.split(F.trim("seq_i"), " +"),
                    lambda s: vocab_map[s],
                ),
                lambda x: x.isNull(),
            )
        ).alias("n_oov"),
    )
    agg = checked.agg(
        F.sum("replay_bad").cast("bigint").alias("import_replay_lossy"),
        F.sum("n_oov").cast("bigint").alias("oov_after_import"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab_words"),
    )
    final.unpersist()
    ids = sorted(imported_vocab.values())
    ids_contiguous = ids == list(range(len(ids)))
    return agg.select(
        F.lit(len(imported_merges)).cast("bigint").alias("n_merges_exported"),
        F.lit(len(imported_vocab)).cast("bigint").alias("n_vocab_entries"),
        "n_vocab_words",
        "import_replay_lossy",
        "oov_after_import",
        F.lit(1 if ids_contiguous else 0).cast("bigint").alias("ids_contiguous_ok"),
    )
