"""Rule-based data-quality alerts (reference: model/messages.py — 14 message types,
R1-R7 in SURVEY.md §2.14). Pure driver logic over the computed stats dict; no Spark
jobs. Thresholds come from ProfileConfig (reference: config_default.yaml:30-44)."""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pandas_profiling_personal_spark.config import ProfileConfig
from pandas_profiling_personal_spark.types import VariableType as VT

if TYPE_CHECKING:  # pragma: no cover
    from pandas_profiling_personal_spark.plans.profile import ProfileResult


def _alert(kind: str, column: str | None = None, **fields) -> dict[str, Any]:
    return {"type": kind, "column": column, **fields}


def compute_alerts(result: "ProfileResult", cfg: ProfileConfig) -> list[dict[str, Any]]:
    alerts: list[dict[str, Any]] = []

    # table rules (reference: messages.py:102-120)
    t = result.table
    if (t.get("p_duplicates") or 0) > cfg.duplicates_threshold:
        alerts.append(
            _alert("DUPLICATES", None, n=t["n_duplicates"], p=t["p_duplicates"])
        )

    for name, v in result.variables.items():
        vt = v.get("type")
        n = v.get("n", 0)
        cnt = v.get("count", 0)

        # generic rules (reference: messages.py:204-257)
        if cnt == 0:
            alerts.append(_alert("REJECTED", name, reason="all values missing"))
            continue
        if v.get("p_missing", 0) > cfg.missing_threshold and v["n_missing"] > 0:
            alerts.append(_alert("MISSING", name, p=v["p_missing"]))
        if v.get("n_distinct") == 1:
            alerts.append(_alert("CONSTANT", name, value=v.get("mode")))
            alerts.append(_alert("REJECTED", name, reason="constant"))
            continue
        if v.get("is_unique"):
            alerts.append(_alert("UNIQUE", name))

        if vt is VT.NUMERIC:
            # numeric rules (reference: messages.py:123-163)
            sk = v.get("skewness")
            if sk is not None and abs(sk) > cfg.skewness_threshold:
                alerts.append(_alert("SKEWED", name, skewness=sk))
            if (v.get("p_infinite") or 0) > 0.01:
                alerts.append(_alert("INFINITE", name, p=v["p_infinite"]))
            if (v.get("p_zeros") or 0) > 0.01:
                alerts.append(_alert("ZEROS", name, p=v["p_zeros"]))
            chi2_p = v.get("chi_squared_p")
            if chi2_p is not None and chi2_p > cfg.chi_squared_threshold:
                alerts.append(_alert("UNIFORM", name))
        elif vt is VT.CATEGORICAL:
            # categorical rules (reference: messages.py:166-201)
            if (v.get("n_distinct") or 0) > cfg.cardinality_threshold:
                alerts.append(
                    _alert("HIGH_CARDINALITY", name, n_distinct=v["n_distinct"])
                )
            if (
                cfg.length_stats
                and v.get("min_length") is not None
                and v["min_length"] == v.get("max_length")
                and cnt > 1
            ):
                alerts.append(_alert("CONSTANT_LENGTH", name, length=v["min_length"]))
            chi2_p = v.get("chi_squared_p")
            if chi2_p is not None and chi2_p > cfg.chi_squared_threshold:
                alerts.append(_alert("UNIFORM", name))
            if v.get("date_like"):
                alerts.append(_alert("TYPE_DATE", name))
        elif vt in (VT.ARRAY, VT.MAP, VT.STRUCT, VT.BINARY, VT.UNSUPPORTED):
            es = v.get("embedding_stats")
            if es:
                # embedding-profiled array column (r6): surface the three
                # breakages an ANN index / training run hits silently —
                # ragged dimensions (breaks every index), non-finite
                # components, zero vectors (cosine undefined)
                if (es.get("n_distinct_dims") or 0) > 1:
                    alerts.append(
                        _alert(
                            "EMBEDDING_RAGGED",
                            name,
                            dim_min=es.get("dim_min"),
                            dim_max=es.get("dim_max"),
                        )
                    )
                if (es.get("n_nonfinite_vectors") or 0) > 0:
                    alerts.append(
                        _alert(
                            "EMBEDDING_NONFINITE",
                            name,
                            n=es["n_nonfinite_vectors"],
                        )
                    )
                if (es.get("n_zero_vectors") or 0) > 0:
                    alerts.append(
                        _alert(
                            "EMBEDDING_ZERO",
                            name,
                            n=es["n_zero_vectors"],
                        )
                    )
            else:
                alerts.append(_alert("UNSUPPORTED", name, dtype=str(vt)))

    # correlation rules (reference: messages.py:290-306)
    for measure, matrix in result.correlations.items():
        seen: set[frozenset] = set()
        for a, row in matrix.items():
            for b, val in row.items():
                if a == b or val is None:
                    continue
                key = frozenset((a, b))
                if key in seen:
                    continue
                seen.add(key)
                if abs(val) >= cfg.correlation_threshold:
                    alerts.append(
                        _alert(
                            "HIGH_CORRELATION",
                            a,
                            other=b,
                            measure=measure,
                            value=val,
                        )
                    )

    # time-series rules (beyond the reference; TS_* prefix like the
    # EMBEDDING_*/DRIFT_* families) — driver arithmetic over the bounded
    # grid diagnostics in result.timeseries
    for name, ts in (result.timeseries.get("columns") or {}).items():
        strength = ts.get("seasonal_strength")
        if strength is not None and strength >= cfg.ts_seasonal_threshold:
            alerts.append(
                _alert(
                    "TS_SEASONAL",
                    name,
                    strength=strength,
                    period=result.timeseries.get("seasonal_period"),
                )
            )
        trend = ts.get("trend_r")
        if trend is not None and abs(trend) >= cfg.ts_trend_threshold:
            alerts.append(_alert("TS_TRENDING", name, trend_r=trend))
        acf1 = ts.get("acf1")
        if acf1 is not None and abs(acf1) >= cfg.ts_autocorr_threshold:
            alerts.append(_alert("TS_AUTOCORRELATED", name, acf1=acf1))
        n_anom = ts.get("n_anomalies") or 0
        if n_anom > 0:
            first = (ts.get("anomalies") or [{}])[0].get("t")
            alerts.append(
                _alert(
                    "TS_ANOMALIES",
                    name,
                    n=n_anom,
                    first=str(first) if first is not None else None,
                )
            )
    return alerts
