"""Learned-model seams: plug fastText-style language-ID or NER-style PII
models into the pipeline behind the SAME column contracts the heuristic
tiers emit (``text.text_profile``'s ``language``, ``pii.pii_scan``'s
``n_*``/``has_pii``), so downstream filters/mixture plans/reports are
model-agnostic.

Design (the honest 100 TB shape for Python-model inference):

* the model is NOT pickled into the plan — the caller passes a ``loader``
  (a zero-arg callable returning the predict function). The loader runs
  ONCE per ``mapInPandas`` partition inside the executor's Python worker,
  so a 100 MB fastText binary is loaded per-worker, not per-row, and the
  driver never has to hold it;
* batches arrive as Arrow-backed ``pd.Series`` — the predict function is
  expected to be vectorized over the batch (fastText's ``predict`` on a
  list, a HuggingFace pipeline with ``batch_size=...``);
* the output contract is schema-checked per batch, loudly — a model that
  returns the wrong columns fails the first batch, not silently downstream.

The heuristic tiers (stopword language-ID, regex PII) remain the default
everywhere: they are pure codegen expressions, ~100x cheaper, and need no
Python worker at all. Reach for these seams only when model quality is
worth one Arrow round-trip per row.

No reference analogue (single-frame profiler); LLM-pipeline tier.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, types as T

from pandas_profiling_personal_spark.functions import stats as S

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: predict contract: pd.Series[str] -> pd.DataFrame with the seam's columns
PredictFn = Callable[["pd.Series"], "pd.DataFrame"]
#: loader contract: () -> PredictFn, executed once per executor partition
LoaderFn = Callable[[], PredictFn]

LANGUAGE_MODEL_SCHEMA = T.StructType(
    [
        T.StructField("language", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)

PII_MODEL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("begin", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
    ]
)


def apply_text_model(
    df: DataFrame,
    text_col: str,
    loader: LoaderFn,
    result_schema: T.StructType,
    id_col: str | None = None,
) -> DataFrame:
    """Generic seam: run a learned model over a text column, returning
    ``(id?, <result_schema columns>)`` — one output row per input row.

    ``loader()`` is called once per partition (lazy model init inside the
    Python worker); its returned predict function maps a ``pd.Series`` of
    strings (nulls included — the model decides what a null means) to a
    ``pd.DataFrame`` with EXACTLY ``result_schema``'s column names, same
    length and positional alignment as the input batch."""
    import pandas as pd  # noqa: F401  (worker-side dependency, checked early)

    in_cols = ([id_col] if id_col else []) + [text_col]
    src = df.select(*[S.col(c) for c in in_cols])
    out_fields = (
        [src.schema[id_col]] if id_col else []
    ) + list(result_schema.fields)
    out_schema = T.StructType(out_fields)
    expected = [f.name for f in result_schema.fields]

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        predict = loader()  # once per partition, inside the executor
        for pdf in it:
            res = predict(pdf[text_col])
            got = list(res.columns)
            if got != expected:
                raise ValueError(
                    f"model output columns {got} != contract {expected}"
                )
            if len(res) != len(pdf):
                raise ValueError(
                    f"model returned {len(res)} rows for a {len(pdf)}-row "
                    "batch; the contract is one output row per input row"
                )
            res = res.reset_index(drop=True)
            if id_col:
                res.insert(0, id_col, pdf[id_col].reset_index(drop=True))
            yield res

    return src.mapInPandas(run, out_schema)


def language_id_model(
    df: DataFrame,
    text_col: str,
    id_col: str | None = None,
    loader: LoaderFn | None = None,
) -> DataFrame:
    """Language-ID behind the ``text_profile`` column contract:
    ``(id?, language, confidence)``.

    Without ``loader`` this is the heuristic tier — the stopword-ratio
    ``language_id`` expression (pure codegen, no Python) with its best
    score as confidence. With a loader (e.g. fastText lid.176 wrapped per
    the :data:`PredictFn` contract) the model replaces the heuristic but
    the output schema is IDENTICAL, so mixture plans keyed on ``language``
    don't change."""
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.operators import text as TX

    if loader is None:
        c = S.col(text_col)
        scores = TX.language_scores(c)
        best_score = None
        for lang in TX.LANG_ORDER:
            s = scores[lang]
            best_score = s if best_score is None else F.greatest(best_score, s)
        cols = [S.col(id_col)] if id_col else []
        lang = TX.language_id(c)
        # confidence describes the EMITTED label: rows language_id rejected
        # (best score below its min_score → 'und') carry a null confidence,
        # not the score of the rejected candidate
        conf = F.when(
            lang != F.lit("und"),
            F.round(best_score, 4).cast("double"),
        )
        return df.select(
            *cols,
            lang.alias("language"),
            conf.alias("confidence"),
        )
    return apply_text_model(
        df, text_col, loader, LANGUAGE_MODEL_SCHEMA, id_col=id_col
    )


def pii_entities_model(
    df: DataFrame,
    text_col: str,
    loader: LoaderFn,
    id_col: str | None = None,
) -> DataFrame:
    """NER-style PII detection: ``(id?, entities array<struct<kind,begin,
    end>>, n_pii, has_pii)`` — the per-entity superset of the regex tier's
    counts (``pii.pii_scan`` keeps its count columns; this seam adds spans
    a redactor can cut exactly).

    The model's predict function returns one ``entities`` cell per input
    row: a list of ``{"kind", "begin", "end"}`` dicts (empty list for
    clean rows). n_pii/has_pii are derived here so gating logic matches
    the regex tier's semantics."""
    from pyspark.sql import functions as F

    schema = T.StructType(
        [T.StructField("entities", T.ArrayType(PII_MODEL_SCHEMA))]
    )
    out = apply_text_model(df, text_col, loader, schema, id_col=id_col)
    n = F.size(F.coalesce(F.col("entities"), F.array()))
    return out.select(
        *([S.col(id_col)] if id_col else []),
        "entities",
        n.cast("long").alias("n_pii"),
        (n > 0).alias("has_pii"),
    )
