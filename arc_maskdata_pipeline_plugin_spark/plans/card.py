"""Per-source dataset-card capstone (oracle-checked).

`q_dataset_card_report` stitches the round-9 corpus diagnostics into the
one-page "dataset card" a curation team publishes per source: size,
vocabulary coverage (observed / Chao1-estimated true vocabulary /
Good-Turing unseen mass), the fitted Heaps growth exponent, language-model
predictability (bigram vs unigram NLL), batching economics (padding
waste under length-sorted loading), and the leave-one-source-out influence
on the corpus mean. The capstone proves COMPOSITION the
same way q_corpus_release_report does: the Spark side reuses each
component query's own plan verbatim and joins at source grain; the oracle
nests each component's registered SQL as a subquery — so a hash match here
re-witnesses every component AND the join.

Scale shape: each component is its own one-or-two-shuffle pipeline (see the
component docstrings); the card joins |sources|-row frames, so composition
adds no corpus-sized work beyond the components themselves.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import REGISTRY, register
from .lm import q_bigram_perplexity
from .training2 import q_loo_source_influence, q_padding_waste
from .vocab import q_chao_coverage, q_heaps_law_curve


def _card_oracle() -> str:
    chao = REGISTRY["q_chao_coverage"].oracle
    heaps = REGISTRY["q_heaps_law_curve"].oracle
    lm = REGISTRY["q_bigram_perplexity"].oracle
    pad = REGISTRY["q_padding_waste"].oracle
    loo = REGISTRY["q_loo_source_influence"].oracle
    return f"""
SELECT c.source,
       l.n_docs,
       c.n_tokens,
       c.d_distinct AS vocab_observed,
       c.chao1_est,
       c.gt_unseen_mass_fp9,
       h.beta_fp6 AS heaps_beta_fp6,
       l.bigram_nll_fp6,
       l.unigram_nll_fp6,
       p.n_batches,
       p.waste_share_fp6 AS sorted_padding_waste_fp6,
       v.influence_fp6
FROM ({chao}) c
JOIN ({heaps}) h ON h.source = c.source AND h.quarter = 4
JOIN ({lm}) l ON l.source = c.source
JOIN ({pad}) p ON p.source = c.source AND p.policy = 'length_sorted'
JOIN ({loo}) v ON v.source = c.source
"""


@register("q_dataset_card_report", oracle=_card_oracle())
def q_dataset_card_report(spark, sf_dir):
    """One row per source: corpus size, Chao1/Good-Turing coverage, Heaps
    exponent, bigram/unigram NLL, and length-sorted padding waste — each
    column produced by the component query's own registered plan (module
    docstring)."""
    cov = q_chao_coverage(spark, sf_dir)
    beta = (
        q_heaps_law_curve(spark, sf_dir)
        .filter(F.col("quarter") == 4)
        .select("source", F.col("beta_fp6").alias("heaps_beta_fp6"))
    )
    lm = q_bigram_perplexity(spark, sf_dir).select(
        "source", "n_docs", "bigram_nll_fp6", "unigram_nll_fp6"
    )
    pad = (
        q_padding_waste(spark, sf_dir)
        .filter(F.col("policy") == "length_sorted")
        .select(
            "source",
            "n_batches",
            F.col("waste_share_fp6").alias("sorted_padding_waste_fp6"),
        )
    )
    loo = q_loo_source_influence(spark, sf_dir).select(
        "source", "influence_fp6"
    )
    return (
        cov.join(beta, "source")
        .join(lm, "source")
        .join(pad, "source")
        .join(loo, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.col("d_distinct").alias("vocab_observed"),
            "chao1_est",
            "gt_unseen_mass_fp9",
            "heaps_beta_fp6",
            "bigram_nll_fp6",
            "unigram_nll_fp6",
            "n_batches",
            "sorted_padding_waste_fp6",
            "influence_fp6",
        )
    )
