"""Profiling configuration.

The reference keeps a *global mutable* confuse YAML singleton
(reference: src/pandas_profiling/config.py:11-178, config_default.yaml:1-194) which is
thread-unsafe with its describe ThreadPool. This engine passes an immutable dataclass
explicitly instead. Field names/thresholds mirror the reference defaults where they
exist so behavior is comparable.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields, replace


@dataclass(frozen=True)
class ProfileConfig:
    # --- accuracy / scale knobs -------------------------------------------------
    #: exact=True uses exact percentile / countDistinct (oracle & test mode);
    #: exact=False uses percentile_approx / approx_count_distinct (100 TB mode).
    exact: bool = False
    #: relative error for approximate quantiles (reference: spark.quantile_error=0.05,
    #: config_default.yaml:98)
    quantile_relative_error: float = 0.05
    #: quantile points reported per numeric column
    #: (reference: summary_algorithms.py:248-252)
    quantiles: tuple[float, ...] = (0.05, 0.25, 0.5, 0.75, 0.95)
    #: max distinct values transferred to the driver per column
    #: (reference: spark.to_pandas_limit=250, config_default.yaml:100)
    driver_value_limit: int = 250
    #: top-N frequent values kept in the report (reference: n_freq_table_max=10)
    top_k: int = 10
    #: extreme observations kept per end (reference: n_extreme_obs=10)
    n_extreme_obs: int = 10
    #: compute bottom/top-N extreme observations for numeric+datetime columns
    #: (rides the pass-2 value-counts cache — no extra table scan)
    extreme_obs: bool = True
    #: 100 TB lever (DEFAULT-ON in the approx tier, r4): skip the exact
    #: pass-2 frequency work (top-K, exact distinct/unique, extremes) for
    #: columns whose pass-1 distinct estimate is >= this fraction of their
    #: non-null count. A near-unique continuous column's frequency table is
    #: all count-1 rows — at corpus scale that is a full-cardinality shuffle
    #: with no diagnostic value. Gated columns keep the pass-1 n_distinct
    #: and report n_unique/top_values as unavailable
    #: (``freq_skipped_near_unique=True``).
    #: "auto" (default) = 0.5 when ``exact=False`` (the scale tier — at 50%
    #: distinct the frequency table is half singletons and the melt exchange
    #: carries half the rows), never in exact/oracle mode; a float forces the
    #: gate in BOTH tiers; None disables it everywhere.
    freq_near_unique_ratio: float | None | str = "auto"
    #: the auto gate only fires for columns with at least this many non-null
    #: rows — on small interactive tables the melt branch is cheap and users
    #: expect complete frequency tables; at scale every column clears it
    freq_gate_min_count: int = 10_000
    #: bucketed 2-D interaction densities for numeric column pairs
    #: (reference renders scatter/hexbin for all continuous pairs,
    #: report/structure/report.py:187-226). One batched shuffle for ALL pairs;
    #: row expansion is quadratic in column count, so capped by
    #: ``interactions_max_cols`` and off in the default tier.
    interactions: bool = False
    interactions_max_cols: int = 10
    interactions_bins: int = 24
    #: restrict interaction pairs to those involving these columns
    #: (reference interactions.targets, config_default.yaml:103-105):
    #: with T targets over N columns the quadratic explode drops to ~T·N,
    #: which is how interactions stay affordable on wide tables
    interactions_targets: tuple[str, ...] = ()
    #: rank every other column's association with this target
    #: (|Pearson| / eta-squared / Cramér's V, batched kernels — see
    #: operators/correlations.target_relevance) as a report section
    relevance_target: str | None = None

    # --- histograms ---------------------------------------------------------------
    #: 0 = auto bins via Freedman-Diaconis/Sturges on the driver
    #: (reference: config_default.yaml:134-141, bins=auto capped at max_bins)
    histogram_bins: int = 0
    histogram_max_bins: int = 250

    # --- feature toggles ------------------------------------------------------
    length_stats: bool = True
    char_analysis: bool = False
    #: explorative string-type refinement (reference "explorative" arg group
    #: activates the url/path/file/image variable types,
    #: config.py:58-70): classify categorical columns whose pass-2 top-K
    #: values look like URLs/paths (driver-side regex over values ALREADY
    #: fetched — zero extra scans for detection) and attach a component
    #: decomposition summary (scheme/netloc/... or dir/stem/suffix counts,
    #: one bounded job per refined column)
    string_refinement: bool = False
    #: embedding refinement: a constant-dimension array<float|double>
    #: column gets an Embedding tab (health profile from
    #: operators/similarity.embedding_stats — ragged dims, zero vectors,
    #: non-finite components, norm stats; one bounded 1-row aggregate per
    #: candidate column). The reference treats arrays as opaque
    #: (summary_algorithms.py:34-41); this is the explorative-tier upgrade.
    embedding_refinement: bool = False
    #: binary-column media refinement: every BinaryType column gets a
    #: full-data format mix + byte-size stats from ONE pure-SQL melt
    #: aggregate (magic-byte sniff, no Python), and when one media family
    #: (image/audio/video) dominates, header stats from a BOUNDED
    #: deterministic sample through the real no-dependency parsers
    #: (netpbm / RIFF-WAVE / Y4M). The reference profiles images only via
    #: path columns (typeset file/image types); this closes the gap for
    #: payloads stored IN the table — the 100 TB multimodal layout.
    binary_refinement: bool = False
    #: rows sampled for the per-modality header-stat pass (bounded cost:
    #: the full-data tier never decodes)
    media_sample_n: int = 512
    #: refinement tier: a categorical column with pass-1 mean_length >= this
    #: is treated as free TEXT — corpus-level language distribution + quality
    #: rollup from the text-pipeline operators attach to the variable
    text_min_mean_length: int = 80
    #: redact value-revealing outputs (reference "sensitive" arg group,
    #: config.py:37-41: samples/duplicates off, categorical values redacted):
    #: top_values/mode/extreme_obs are withheld from results
    redact: bool = False
    #: correlation measures to compute: subset of
    #: {"pearson","spearman","kendall","cramers","phik"}; reference Spark defaults
    #: enable only pearson (config_default.yaml:70-92)
    correlations: tuple[str, ...] = ("pearson",)
    #: max distinct for a categorical column to enter Cramér's V
    #: (reference: categorical_maximum_correlation_distinct=100)
    categorical_maximum_correlation_distinct: int = 100
    duplicates: bool = True
    #: top-N duplicate row groups (reference: duplicates.head=10)
    duplicates_head: int = 10
    #: hash-compressed duplicate pass (group on two salted xxhash64 of the row
    #: instead of the full row payload — ~10-50x less exchange volume on wide
    #: tables; see operators/duplicates.duplicate_summary_hashed). "auto":
    #: hashed when the table has > duplicates_hash_min_cols grouped columns.
    #: The r14 threshold drop 20 -> 8 is measured: even at 11 narrow lineitem
    #: columns the hashed exchange (16 B + count per row) beats the full-row
    #: groupBy by ~24% locally and by the payload ratio (~5x fewer exchange
    #: bytes) at scale; below ~8 columns the row is as narrow as the hashes.
    #: "auto" applies only in the approx tier (exact mode keeps the full-row
    #: groupBy, so oracle/test semantics and top-N tie-breaks never change).
    duplicates_hash: bool | str = "auto"
    duplicates_hash_min_cols: int = 8
    samples_head: int = 10
    samples_random: int = 10
    #: tail sample size (K3). 0 disables (the default — the reference skips
    #: tail on Spark entirely, dataframe_wrappers.py:331-342; df.tail() is a
    #: driver-heavy full-scan action, so it is opt-in and driver-bounded)
    samples_tail: int = 0
    missing_diagrams: bool = True
    #: content-based type inference (string->bool/numeric, low-cardinality numeric
    #: ->categorical), mirroring the reference *pandas* path which its Spark path
    #: dropped (reference: typeset_relations.py:39-101)
    infer_types: bool = False
    low_categorical_threshold: int = 5
    #: with infer_types: string columns fully castable to timestamp
    #: reclassify as DATETIME (reference vars.cat.coerce_str_to_date,
    #: config_default.yaml:45 — opt-in there too; NUMERIC wins ties so
    #: year-only strings stay numeric)
    coerce_str_to_date: bool = False

    # --- alert thresholds (reference: config_default.yaml:30-44) -----------------
    skewness_threshold: float = 20.0
    cardinality_threshold: int = 50
    unique_threshold: float = 1.0  # p_unique >= -> UNIQUE (not an alert by default)
    missing_threshold: float = 0.0  # p_missing > -> MISSING alert
    zeros_threshold: float = 0.0  # p_zeros > 0 and > 1% -> ZEROS
    chi_squared_threshold: float = 0.999
    correlation_threshold: float = 0.9
    duplicates_threshold: float = 0.01  # >1% duplicate rows -> DUPLICATES alert

    # --- report metadata (reference: config_default.yaml:1-17,
    # report/structure/overview.py:73-114 render dataset.{description,
    # creator, author, copyright_holder, copyright_year, url} as an overview
    # "Dataset" tab and variables.descriptions as per-variable captions) ----
    title: str = "Data profile"
    dataset_description: str = ""
    dataset_creator: str = ""
    dataset_author: str = ""
    dataset_copyright_holder: str = ""
    dataset_copyright_year: str = ""
    dataset_url: str = ""
    #: (column, description) pairs — a dict in from_dict/YAML is coerced;
    #: stored as a tuple so the frozen config stays hashable
    variable_descriptions: tuple[tuple[str, str], ...] = ()
    #: render the description on each variable section, not just the
    #: overview (reference: show_variable_description, config_default.yaml:17)
    show_variable_description: bool = True

    # --- report style (reference: config_default.yaml:172-194 html.style.
    # {primary_color, logo, full_width} + navbar_show) ----------------------
    #: report theme: None (light default) or "dark" — the dependency-free
    #: analogue of the reference's bootswatch html.style.theme
    html_theme: str | None = None
    #: accent color for nav/headers/bars; None keeps the built-in palette
    html_primary_color: str | None = None
    #: logo image URL or data: URI rendered beside the title
    html_logo: str | None = None
    html_navbar: bool = True
    #: stretch the layout instead of the 1150px centered column
    html_full_width: bool = False

    # --- layout advice (beyond the reference: operators/layout.py) ---------
    #: attach write-layout advice (partition/bucket/salt recommendations)
    #: to the result and report — ZERO extra Spark jobs, the rules run over
    #: stats the profile already measured (suggest_layout_from_profile)
    layout_advice: bool = False
    #: declared equi-join/groupBy keys for the bucket + salting rules;
    #: names not present in the profiled columns are ignored (the profile
    #: may be column-scoped)
    layout_join_keys: tuple[str, ...] = ()
    #: mine single-column functional dependencies into the result and a
    #: Relationships report section (operators/checks.discover_fds: HLL
    #: prune + screen, exact melt verification — opt-in, the melt is an
    #: extra pass). Rows carry only column names and group counts, no
    #: data values, so the section renders under redact too
    discover_fds: bool = False
    #: mine unique column combinations (candidate keys) into the result
    #: and the Relationships report section (operators/checks.
    #: discover_keys: NULL-adjusted HLL screen + TANE level-2 lattice +
    #: one shared melt — opt-in, the melt is an extra pass). Rows carry
    #: only column names and counts, no data values: redact-safe
    discover_keys: bool = False

    # --- misc ---------------------------------------------------------------------
    seed: int = 42
    #: persist the input before the multi-pass profile (reference persists an
    #: na.drop() copy eagerly, dataframe_wrappers.py:366-372; we persist the raw df
    #: and use null-aware aggregates instead)
    persist: bool = True
    column_order: str = "none"  # none | asc | desc (reference: summary.py:124-132)
    #: per-segment tier (beyond the reference): profile numeric summaries and
    #: categorical top-K per value of this column (language / source / shard),
    #: bounded to the top ``segment_top_n`` segments by count. Rendered as a
    #: Segments section in the HTML report; skipped under ``redact``.
    segment_by: str | None = None
    segment_top_n: int = 10
    #: time-series tier (beyond the reference — its successor's tsmode is
    #: pandas-only, sortable-index-bound): declare the event-time column
    #: and every numeric column gets autocorrelation, calendar-seasonality
    #: strength (exact one-way eta² over raw rows), linear trend and grid
    #: coverage — ALL columns from ONE date_trunc grid aggregate (a single
    #: combine-friendly shuffle over the raw table; the bounded grid
    #: collects to the driver where the rest is exact arithmetic — the
    #: drift-state pattern). Rendered as a Time series section; TS_*
    #: alert rules fire on strong seasonality/trend/autocorrelation.
    timeseries_ts_col: str | None = None
    timeseries_lags: int = 24
    timeseries_granularity: str = "hour"  # minute | hour | day
    timeseries_max_cols: int = 20
    #: TS_* alert thresholds: |acf lag-1|, |trend_r|, seasonal eta²
    ts_autocorr_threshold: float = 0.8
    ts_trend_threshold: float = 0.6
    ts_seasonal_threshold: float = 0.3

    def with_(self, **kw) -> "ProfileConfig":
        return replace(self, **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "ProfileConfig":
        """Build a config from a plain dict (YAML/JSON overlay). An optional
        ``preset`` key ("default" | "minimal" | "exact" | "explorative" |
        "sensitive") picks the base tier; remaining keys override fields.
        Unknown keys raise ValueError (reference behavior: 'Config parameter
        "x" does not exist', reference config.py:96)."""
        d = dict(d or {})
        preset = str(d.pop("preset", "default")).lower()
        bases = {
            "default": cls(),
            "minimal": MINIMAL,
            "exact": EXACT,
            "explorative": EXPLORATIVE,
            "sensitive": SENSITIVE,
        }
        if preset not in bases:
            raise ValueError(
                f"unknown preset {preset!r}; one of {sorted(bases)}"
            )
        base = bases[preset]
        valid = {f.name for f in fields(cls)}
        unknown = set(d) - valid
        if unknown:
            raise ValueError(
                f"Config parameter(s) {sorted(unknown)} do not exist"
            )
        # YAML lists arrive as lists; tuple-typed fields need coercion.
        # variable_descriptions additionally accepts a {column: text}
        # mapping (the reference's variables.descriptions shape).
        for k, v in list(d.items()):
            if isinstance(v, list):
                d[k] = tuple(tuple(x) if isinstance(x, list) else x
                             for x in v)
            elif k == "variable_descriptions" and isinstance(v, dict):
                d[k] = tuple(sorted((str(c), str(t)) for c, t in v.items()))
        return base.with_(**d)

    @classmethod
    def from_yaml(cls, path) -> "ProfileConfig":
        """Load a YAML config overlay (reference supports config files via
        confuse, config.py:26-34; spark-submit users can't pass Python
        kwargs). PyYAML is dependency-optional."""
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "ProfileConfig.from_yaml needs PyYAML; pass a dict to "
                "ProfileConfig.from_dict instead"
            ) from exc
        with open(path) as fh:
            data = yaml.safe_load(fh)
        if data is None:
            data = {}
        if not isinstance(data, dict):
            raise ValueError(f"config file {path} must hold a mapping")
        return cls.from_dict(data)


#: reference "minimal" tier (reference: config_minimal.yaml): cheap stats only.
MINIMAL = ProfileConfig(
    correlations=(),
    duplicates=False,
    char_analysis=False,
    missing_diagrams=False,
    histogram_bins=10,
)

#: oracle/test tier: exact estimators so results hash-match a DuckDB oracle.
EXACT = ProfileConfig(exact=True)

#: reference "explorative" tier (reference config.py:58-70: unicode char
#: analysis on, url/path/file/image types active, n_freq_table_max=25):
#: char analysis + string-type refinement + content-based type inference,
#: wider top-K.
EXPLORATIVE = ProfileConfig(
    char_analysis=True,
    string_refinement=True,
    embedding_refinement=True,
    binary_refinement=True,
    infer_types=True,
    top_k=25,
)

#: reference "sensitive" tier (reference config.py:37-41): no raw values in
#: the result — samples/duplicates off, frequent/extreme values withheld.
SENSITIVE = ProfileConfig(
    samples_head=0,
    samples_random=0,
    duplicates=False,
    redact=True,
)
