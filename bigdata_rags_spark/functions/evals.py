"""Model-eval aggregation operators: pass@k and self-consistency voting.

The two aggregations every LLM eval harness runs over sampled
generations, expressed as exact-integer Spark aggregates so a SQL oracle
replays them bit-for-bit:

- ``pass_at_k``: the unbiased estimator from Chen et al. 2021 ("Evaluating
  Large Language Models Trained on Code", the HumanEval paper):
  ``pass@k = 1 - C(n-c, k) / C(n, k)`` per task with n samples and c
  correct.  The binomial ratio telescopes to
  ``prod_{i<k} (n-c-i) / (n-i)`` — evaluated as ONE bigint numerator
  product and ONE denominator product (n is sample-count-bounded, so the
  products never overflow), then a single floor division:
  ``pass_micro = 1e6 - num * 1e6 DIV den``.  When fewer than k samples
  are incorrect the numerator clamps to 0 (every k-subset contains a
  correct sample — pass@k is exactly 1).

- ``majority_vote``: self-consistency aggregation (Wang et al. 2022,
  "Self-Consistency Improves Chain of Thought Reasoning"): the modal
  answer per task (ties broken toward the LOWEST answer — engine-exact),
  its vote count, and the integer-micro agreement rate.

Scale shape: both are one hash agg over (task) or (task, answer) rows —
the groupBy-sum/argmax shapes the rest of the repo serves at corpus
size; the vote argmax is a per-task window over that task's distinct
answers only.  Extension beyond the reference (no eval surface —
SURVEY.md §2 extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pass_at_k(
    samples: DataFrame,
    group_col: str = "task_id",
    correct_col: str = "correct",
    ks: tuple[int, ...] = (1, 5),
) -> DataFrame:
    """Per-task pass@k for every k in ``ks``: (task, n_samples, n_correct,
    pass{k}_micro ...).  Tasks with fewer than max(ks) samples are dropped
    (the estimator needs n >= k)."""
    kmax = max(ks)
    agg = samples.groupBy(F.col(group_col).alias("task_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum(F.col(correct_col).cast("bigint")).cast("bigint").alias("n_correct"),
    ).filter(F.col("n_samples") >= kmax)
    out = agg
    cols = ["task_id", "n_samples", "n_correct"]
    for k in ks:
        num = " * ".join(f"GREATEST(n_samples - n_correct - {i}, 0)" for i in range(k))
        den = " * ".join(f"(n_samples - {i})" for i in range(k))
        out = out.withColumn(
            f"pass{k}_micro",
            F.expr(f"CAST(1000000 - ({num}) * 1000000 DIV ({den}) AS BIGINT)"),
        )
        cols.append(f"pass{k}_micro")
    return out.select(*cols)


def majority_vote(
    samples: DataFrame,
    group_col: str = "task_id",
    answer_col: str = "answer",
) -> DataFrame:
    """Self-consistency vote per task: (task, vote, votes, n_samples,
    n_distinct_answers, agreement_micro) — the modal answer (ties toward
    the lowest answer value) and how much of the sample mass agreed."""
    from pyspark.sql import Window

    votes = samples.groupBy(
        F.col(group_col).alias("task_id"), F.col(answer_col).alias("vote")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
    totals = votes.groupBy("task_id").agg(
        F.sum("votes").cast("bigint").alias("n_samples"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_answers"),
    )
    w = Window.partitionBy("task_id").orderBy(F.col("votes").desc(), F.col("vote"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(totals, "task_id")
        .select(
            "task_id",
            "vote",
            "votes",
            "n_samples",
            "n_distinct_answers",
            F.expr("votes * 1000000 DIV n_samples").cast("bigint").alias(
                "agreement_micro"
            ),
        )
    )
