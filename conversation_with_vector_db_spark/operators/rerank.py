"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
over retrieved candidate sets.

The reference's RAG read path takes raw cosine top-k as the prompt
context (reference: controllers/conversationController.js:32-76);
near-duplicate chunks waste the context budget. MMR greedily picks
the next document maximizing

    lambda * rel(q, d)  -  (1 - lambda) * max_{s in S} sim(d, s)

so each added context chunk is both relevant and NOVEL vs what's
already selected.

Distribution shape: the greedy loop is inherently sequential in k but
k and the candidate pool are SMALL BY CONTRACT (a re-ranker runs on a
first-stage top-n, n ~ tens) while the number of QUERIES is what
scales. So the plan is `groupBy(qid).applyInPandas` — per-query
greedy over an n x n numpy similarity matrix inside one Arrow batch,
thousands of queries re-ranked in parallel, no driver involvement and
nothing quadratic in the corpus. The first stage (exact or ANN top-n)
is where corpus scale is handled; this operator never sees more than
n rows per query.

Determinism/parity: both relevance and doc-doc sims are rounded to 4
digits BEFORE the greedy, and every argmax breaks ties by id — the
selection then depends only on exact double arithmetic over 4-digit
operands, which is reproducible bit-for-bit by the ANSI-SQL oracle
(a recursive CTE re-running the same greedy in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROUND_DIGITS = 4


def mmr_rerank(
    cands: DataFrame,
    k: int,
    lambda_: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "sim",
) -> DataFrame:
    """Greedy MMR per query group.

    ``cands``: (qid, id, rel, vector) — the first-stage top-n per
    query WITH vectors attached (rel already rounded, as
    :func:`..operators.vector.exact_topk` emits). Returns
    (qid, id, mmr_rank 1..k).

    Doc-doc cosines are computed inside the group batch (n x n on ~n
    = tens of rows) and rounded to :data:`ROUND_DIGITS` to pin
    cross-engine argmax decisions.
    """
    import numpy as np
    import pandas as pd

    lam = float(lambda_)

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [rel_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(pdf)
        kk = min(k, n)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        dd = np.round(unit @ unit.T, ROUND_DIGITS)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()

        picked: list[int] = [0]  # row 0 is argmax rel (tie: min id)
        remaining = list(range(1, n))
        for _ in range(1, kk):
            best = None
            for i in remaining:
                novelty = dd[i, picked].max()
                score = lam * rel[i] - (1.0 - lam) * novelty
                key = (-score, ids[i])
                if best is None or key < best[0]:
                    best = (key, i)
            picked.append(best[1])
            remaining.remove(best[1])
        return pd.DataFrame(
            {
                "qid": pdf["qid"].iloc[:1].repeat(kk).to_numpy(),
                id_col: ids[picked],
                "mmr_rank": np.arange(1, kk + 1, dtype=np.int32),
            }
        )

    return cands.groupBy("qid").applyInPandas(
        greedy, f"qid long, {id_col} long, mmr_rank int"
    )
