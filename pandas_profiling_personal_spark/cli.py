"""Command-line entry (S7, reference: controller/console.py:86-109).

    python -m pandas_profiling_personal_spark.cli INPUT [OUTPUT.html|.json] \
        [--minimal | --explorative | --sensitive | --config FILE.yaml] \
        [--exact] [--infer-types] [--title T] [--master local[N]]

Reads any supported file (parquet/csv/json/orc + pandas formats) via
``spark.read`` and writes an HTML and/or JSON profile.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _progress_renderer(args):
    """``--verbose`` progress hook for :func:`profile` — renders
    ``[i/n] stage (elapsed s)`` lines to stderr as each pass completes
    (the reference's ``progress_bar``, tqdm-free). ``--quiet`` wins;
    default is silent (stdout stays machine-parseable either way)."""
    if args.quiet or not args.verbose:
        return None
    t0 = time.time()

    def cb(stage: str, i: int, n: int) -> None:
        print(
            f"[{i}/{n}] {stage} ({time.time() - t0:.1f}s)",
            file=sys.stderr,
            flush=True,
        )

    return cb


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spark-profile",
        description="PySpark-native data profiling (pandas-profiling capabilities)",
    )
    p.add_argument("input", help="input table file (parquet/csv/json/orc/...)")
    p.add_argument(
        "output",
        nargs="?",
        default=None,
        help="output report path (.html or .json); default: <input>.html",
    )
    p.add_argument("--minimal", action="store_true", help="cheap-stats tier")
    p.add_argument(
        "--exact", action="store_true", help="exact estimators (test/oracle tier)"
    )
    p.add_argument(
        "--explorative",
        action="store_true",
        help="explorative tier: char analysis, url/path type refinement, "
        "type inference, top-25 (reference explorative arg group)",
    )
    p.add_argument(
        "--sensitive",
        action="store_true",
        help="sensitive tier: no raw values in the report "
        "(reference sensitive arg group)",
    )
    p.add_argument(
        "--config",
        default=None,
        metavar="YAML",
        help="YAML config overlay (optional 'preset:' key + field overrides; "
        "see ProfileConfig.from_yaml) — explicit flags still win",
    )
    p.add_argument("--infer-types", action="store_true")
    p.add_argument(
        "--tail",
        type=int,
        default=0,
        metavar="N",
        help="include the last N rows as a sample (K3; driver-bounded full scan)",
    )
    p.add_argument(
        "--near-unique-ratio",
        type=float,
        default=None,
        metavar="R",
        help="skip exact frequency stats for columns with distinct/count >= R "
        "(100 TB lever; see ProfileConfig.freq_near_unique_ratio)",
    )
    p.add_argument(
        "--segment-by",
        default=None,
        metavar="COL",
        help="per-segment tier: numeric summaries + top-K per value of COL "
        "(top segments by count), rendered as a Segments section",
    )
    p.add_argument(
        "--timeseries-col",
        default=None,
        metavar="TSCOL",
        help="time-series tier: ACF / seasonality / trend per numeric "
        "column over the TSCOL event-time axis (one grid aggregate), "
        "rendered as a Time series section with TS_* alerts",
    )
    p.add_argument(
        "--timeseries-granularity",
        default=None,
        choices=["minute", "hour", "day"],
        help="grid granularity for --timeseries-col (default hour)",
    )
    p.add_argument(
        "--domain-from",
        default=None,
        metavar="URLCOL",
        help="corpus report: derive a 'domain' segment (registered domain "
        "via parse_url HOST + public-suffix-lite collapse) from URL column "
        "URLCOL — the C4/RefinedWeb-style per-domain curation view",
    )
    p.add_argument(
        "--media-col",
        default=None,
        metavar="BINCOL",
        help="corpus report: profile opaque binary column BINCOL (bytes, "
        "formats, dimensions, exact + perceptual duplicate counts) as a "
        "Media section",
    )
    p.add_argument(
        "--compare",
        default=None,
        metavar="INPUT2",
        help="profile INPUT2 with the same config and write a comparison "
        "report (INPUT = baseline, INPUT2 = candidate) instead of a single "
        "profile",
    )
    p.add_argument(
        "--relevance-target", default=None, metavar="COL",
        help="rank every other column's association with this target "
        "(|Pearson| / eta-squared / Cramér's V) as a report section",
    )
    p.add_argument(
        "--layout-advice", action="store_true",
        help="attach write-layout advice (partition/bucket/salt "
        "recommendations) to the report and JSON — zero extra Spark jobs",
    )
    p.add_argument(
        "--join-keys", default=None, metavar="COL[,COL...]",
        help="declared join/groupBy keys for the layout advisor's bucket "
        "and salting rules (implies --layout-advice)",
    )
    p.add_argument("--title", default=None)
    p.add_argument(
        "--description",
        default=None,
        help="dataset description rendered on the overview Dataset card "
        "and kept in the JSON metadata (reference dataset.description)",
    )
    p.add_argument(
        "--dataset-url",
        default=None,
        help="dataset source URL for the overview Dataset card",
    )
    p.add_argument(
        "--var-description",
        action="append",
        default=None,
        metavar="COL=TEXT",
        help="per-variable description caption (repeatable; reference "
        "variables.descriptions)",
    )
    p.add_argument(
        "--theme", default=None, choices=["dark"],
        help="report theme (reference html.style.theme); default light",
    )
    p.add_argument(
        "--primary-color",
        default=None,
        help="report accent color (reference html.style.primary_color)",
    )
    p.add_argument(
        "--logo",
        default=None,
        help="logo URL or data: URI beside the report title",
    )
    p.add_argument(
        "--no-navbar", action="store_true", help="hide the sticky nav"
    )
    p.add_argument(
        "--full-width",
        action="store_true",
        help="stretch the layout (reference html.full_width)",
    )
    p.add_argument(
        "--verbose",
        action="store_true",
        help="render per-pass progress to stderr ([i/n] stage, elapsed) — "
        "the reference's progress_bar surface without a tqdm dependency",
    )
    p.add_argument(
        "--quiet",
        action="store_true",
        help="suppress progress output (wins over --verbose)",
    )
    p.add_argument("--master", default=None, help="spark master (default local[N])")
    g = p.add_argument_group("corpus preparation (training-data pipeline)")
    g.add_argument(
        "--prepare-corpus",
        default=None,
        metavar="OUTDIR",
        help="instead of profiling: run the corpus funnel (C4 line clean -> "
        "quality -> exact dedup -> optional decontamination) on INPUT, "
        "print the per-stage survivor counts, and write the surviving "
        "corpus (or token chunks) to OUTDIR",
    )
    g.add_argument("--id-col", default="doc_id", help="document id column")
    g.add_argument("--text-col", default="text", help="document text column")
    g.add_argument(
        "--chunk", type=int, default=None, metavar="TOKENS",
        help="emit sliding-window chunks of this many tokens instead of docs",
    )
    g.add_argument(
        "--overlap", type=int, default=0, metavar="TOKENS",
        help="chunk overlap (with --chunk)",
    )
    g.add_argument(
        "--shards", type=int, default=None, metavar="N",
        help="write N deterministic training shards (md5-shuffled) instead "
        "of a plain table",
    )
    g.add_argument(
        "--decontaminate",
        default=None,
        metavar="BENCHMARK",
        help="benchmark table: drop docs sharing 8-gram shingles with it",
    )
    g.add_argument(
        "--no-line-filter", action="store_true",
        help="skip the C4 line-cleaning stage",
    )
    g.add_argument(
        "--near-dup-jaccard", type=float, default=None, metavar="J",
        help="add the MinHash near-dup stage to the funnel: drop "
        "exact-dedup winners with a verified near-duplicate (Jaccard >= J) "
        "of lower id",
    )
    g.add_argument(
        "--corpus-report", action="store_true",
        help="instead of a table profile: write a CORPUS report for INPUT "
        "(language mix, quality, duplication, PII, repetition, packing) to "
        "OUTPUT (.html or .json)",
    )
    g.add_argument(
        "--context-len", type=int, default=None, metavar="TOKENS",
        help="context window for the report's packing section "
        "(default: --chunk if given, else 2048)",
    )
    s = p.add_argument_group("incremental states (daily pipeline)")
    s.add_argument(
        "--save-state",
        default=None,
        metavar="STATE_JSON",
        help="instead of a report: profile INPUT into a mergeable shard "
        "state (moments, sketches, mergeable histograms + Pearson) and "
        "write it as JSON — the daily-incremental building block",
    )
    s.add_argument(
        "--state-bins", type=int, default=10, metavar="N",
        help="histogram bins when deriving a NEW state's edges "
        "(ignored with --align-state)",
    )
    s.add_argument(
        "--align-state",
        default=None,
        metavar="STATE_JSON",
        help="with --save-state: reuse this earlier state's histogram "
        "specs (shared edges) so the two states merge and drift exactly",
    )
    s.add_argument(
        "--drift-against",
        default=None,
        metavar="STATE_JSON",
        help="instead of a profile: profile INPUT into a state aligned to "
        "the stored state's edges and write the incremental drift report "
        "(numeric + categorical PSI, association, alerts) to OUTPUT",
    )
    s.add_argument(
        "--categorical-pairs",
        default=None,
        metavar="A:B[,C:D...]",
        help="with --save-state: also carry a mergeable contingency state "
        "per listed column pair (exact incremental Cramér's V / phik and "
        "association drift); --align-state and --drift-against reuse the "
        "STORED state's declared pairs automatically",
    )
    s.add_argument(
        "--discover-fds",
        action="store_true",
        help="MINE single-column functional dependencies (HLL prune + "
        "screen, exact melt verification): on a profile run, attach them "
        "as a Relationships section; with --suggest-checks, declare every "
        "exact hold as a functional_dependency check; with "
        "--checks-from-state, SCREEN candidates from the state's "
        "--fd-pairs sketches with zero rescans (ranked in the output; "
        "verify survivors with a later raw-table --discover-fds run)",
    )
    s.add_argument(
        "--fd-pairs",
        default=None,
        metavar="A:B[,A:B...]",
        help="with --save-state: also carry pair-tuple HLL sketches for "
        "the listed unordered column pairs (the state-mode FD-discovery "
        "screen tier — rank candidates later with --discover-fds "
        "--checks-from-state, zero rescans); --align-state reuses the "
        "stored state's declared pairs automatically",
    )
    s.add_argument(
        "--fd-min-ratio",
        type=float,
        default=None,
        metavar="R",
        help="with --suggest-checks --discover-fds: ALSO declare near-FDs "
        "whose measured dependency_ratio >= R as functional_dependency "
        "contracts with min_ratio = the measured ratio floored to 4 "
        "decimals (learn the current level, gate regressions); exact "
        "holds stay min_ratio=1",
    )
    s.add_argument(
        "--fks-catalog",
        default=None,
        metavar="NAME=PATH[,NAME=PATH...]",
        help="catalog-level inclusion/FK REPORT: mine every ordered pair "
        "of {the input table + the named tables} in one call (one stats "
        "scan per table, batched distinct-values anti-joins) and print "
        "the ranked containments as JSON — a report, not declared "
        "contracts (use --discover-fks with --suggest-checks for those)",
    )
    s.add_argument(
        "--discover-keys",
        action="store_true",
        help="MINE unique column combinations (candidate keys, unary + "
        "binary, HLL screens + exact melt verification): on a profile "
        "run, attach them to the Relationships section; with "
        "--suggest-checks, declare every verified null-free key as a "
        "primary_key check (nullable keys as uniqueness); with "
        "--checks-from-state, SCREEN candidates from the state's "
        "sketches with zero rescans (ranked in the output)",
    )
    s.add_argument(
        "--discover-fks",
        default=None,
        metavar="NAME=PATH[,NAME=PATH...]",
        help="with --suggest-checks: MINE inclusion dependencies from the "
        "input into each named parent table (min/max+HLL screen, exact "
        "distinct-values anti-join) and declare every contained pair as a "
        "foreign_key check referencing NAME — gate later with "
        "--checks --checks-refs NAME=PATH",
    )
    s.add_argument(
        "--group-pairs",
        default=None,
        metavar="CAT:NUM[,CAT:NUM...]",
        help="with --save-state: also carry mergeable per-category "
        "[n, sum y, sum y^2] cells per listed (categorical, numeric) pair "
        "(exact incremental eta-squared / state-mode target relevance); "
        "--align-state reuses the STORED state's declared pairs "
        "automatically",
    )
    s.add_argument(
        "--relevance-from-state",
        default=None,
        metavar="TARGET",
        help="instead of a profile: INPUT is a saved state JSON — rank "
        "every feature the state carries kernels for (Pearson pairs, "
        "group-moment cells, contingency pairs) against TARGET and write "
        "the ranking JSON to OUTPUT (stdout if omitted). ZERO Spark jobs",
    )
    s.add_argument(
        "--embedding-col",
        default=None,
        metavar="COL",
        help="with --save-state: also profile this array<float> column "
        "into a mergeable embedding state (sidecar STATE_JSON.emb) — "
        "norm-bucket counts + per-dimension power sums; --align-state "
        "reuses the stored sidecar's edges/dim, --drift-against picks the "
        "sidecar up automatically and adds the EMBEDDING_* drift signals "
        "to the report",
    )
    s.add_argument(
        "--embedding-dim", type=int, default=None, metavar="N",
        help="embedding dimensionality (default: inferred as the modal "
        "vector size of --embedding-col)",
    )
    c = p.add_argument_group("data-quality checks (validation gate)")
    c.add_argument(
        "--checks", default=None, metavar="SUITE_JSON",
        help="run the declared check suite (JSON: {\"checks\": [{kind, "
        "column, ...}]}) against the input table; prints a one-line JSON "
        "summary and exits 4 if any check fails — the CI-gate mode",
    )
    c.add_argument(
        "--checks-refs", default=None, metavar="NAME=PATH[,NAME=PATH...]",
        help="reference tables for foreign_key checks (NAME matches the "
        "check's 'ref' field)",
    )
    c.add_argument(
        "--checks-from-state", action="store_true",
        help="with --checks: INPUT is a saved state JSON (--save-state "
        "output), not a table — evaluates the state-expressible subset "
        "with zero data rescans; scan-needing checks refuse by name",
    )
    c.add_argument(
        "--checks-log", default=None, metavar="JSONL",
        help="with --checks: metric history file — today's result rows "
        "append as one JSONL line after gating, and once the file holds "
        "enough runs, values deviating from their OWN history (>3 sigma) "
        "are reported as CHECK_METRIC_ANOMALY in the summary (the "
        "complement of fixed bounds: a drop from the usual 0.99 to 0.97 "
        "flags even when the declared floor is 0.95)",
    )
    c.add_argument(
        "--violations", type=int, default=0, metavar="N",
        help="with --checks: when the gate fails, also report the N "
        "heaviest violating values per FAILED row-level check (one "
        "bounded job per failed check — the debugging surface behind "
        "the ratio)",
    )
    c.add_argument(
        "--fail-on-anomaly", action="store_true",
        help="with --checks-log: exit 5 when metric-history anomalies are "
        "detected even though every declared bound passed — turns the "
        "history gate into a real CI gate instead of an annotation "
        "(bound failures still exit 4, which takes precedence)",
    )
    c.add_argument(
        "--suggest-checks", default=None, metavar="OUT_JSON",
        help="profile the input and write a suggested check suite (the "
        "file --checks reads) — every suggested check passes on the "
        "profiled data; edit thresholds, then gate tomorrow's load",
    )
    return p


def _parse_pairs(
    spec: str, flag: str = "--categorical-pairs"
) -> list[tuple[str, str]]:
    pairs = []
    for item in spec.split(","):
        parts = item.split(":")
        if len(parts) != 2 or not parts[0].strip() or not parts[1].strip():
            raise SystemExit(
                f"{flag}: bad pair {item!r} (want colA:colB)"
            )
        pairs.append((parts[0].strip(), parts[1].strip()))
    return pairs


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    modes = [
        m for m, on in (
            ("--corpus-report", args.corpus_report),
            ("--prepare-corpus", args.prepare_corpus is not None),
            ("--compare", args.compare is not None),
            ("--save-state", args.save_state is not None),
            ("--drift-against", args.drift_against is not None),
            ("--checks", args.checks is not None),
            ("--suggest-checks", args.suggest_checks is not None),
            ("--relevance-from-state", args.relevance_from_state is not None),
        ) if on
    ]
    if args.checks_from_state and not (args.checks or args.suggest_checks):
        parser.error("--checks-from-state needs --checks or --suggest-checks")
    if args.discover_fks and not args.suggest_checks:
        parser.error("--discover-fks needs --suggest-checks")
    if args.fd_min_ratio is not None:
        if not (args.suggest_checks and args.discover_fds):
            parser.error(
                "--fd-min-ratio needs --suggest-checks --discover-fds"
            )
        if not (0.0 < args.fd_min_ratio <= 1.0):
            parser.error("--fd-min-ratio must be in (0, 1]")
    if args.fail_on_anomaly and not args.checks_log:
        parser.error("--fail-on-anomaly needs --checks-log")
    if args.checks_refs and not args.checks:
        parser.error("--checks-refs needs --checks")
    if args.checks_log and not args.checks:
        parser.error("--checks-log needs --checks")
    if len(modes) > 1:
        parser.error(
            "choose ONE mode: " + " / ".join(modes) + " are mutually "
            "exclusive (each writes a different artifact)"
        )
    if args.relevance_from_state:
        # pure driver arithmetic over the saved cells — no Spark session
        from pandas_profiling_personal_spark.plans.incremental import (
            PartialProfile, target_relevance_of,
        )

        with open(args.input, encoding="utf-8") as fh:
            part = PartialProfile.from_json(fh.read())
        try:
            ranking = target_relevance_of(part, args.relevance_from_state)
        except ValueError as e:
            raise SystemExit(f"--relevance-from-state refused: {e}")
        payload = json.dumps(
            {"target": args.relevance_from_state, "relevance": ranking},
            indent=1,
        )
        if args.output:
            with open(args.output, "w", encoding="utf-8") as fh:
                fh.write(payload + "\n")
        print(payload)
        return 0
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.config import MINIMAL
    from pandas_profiling_personal_spark.report import html as html_report
    from pandas_profiling_personal_spark.session import get_session
    from pandas_profiling_personal_spark.sources.readers import read_table

    from pandas_profiling_personal_spark.config import EXPLORATIVE, SENSITIVE

    if args.config:
        cfg = ProfileConfig.from_yaml(args.config)
    elif args.minimal:
        cfg = MINIMAL
    elif args.explorative:
        cfg = EXPLORATIVE
    elif args.sensitive:
        cfg = SENSITIVE
    else:
        cfg = ProfileConfig()
    if args.config and args.explorative:
        cfg = cfg.with_(
            char_analysis=True, string_refinement=True, infer_types=True
        )
    if args.config and args.sensitive:
        cfg = cfg.with_(
            samples_head=0, samples_random=0, duplicates=False, redact=True
        )
    if args.exact:
        cfg = cfg.with_(exact=True)
    if args.infer_types:
        cfg = cfg.with_(infer_types=True)
    if args.tail:
        cfg = cfg.with_(samples_tail=args.tail)
    if args.near_unique_ratio is not None:
        cfg = cfg.with_(freq_near_unique_ratio=args.near_unique_ratio)
    if args.segment_by:
        cfg = cfg.with_(segment_by=args.segment_by)
    if args.timeseries_col:
        cfg = cfg.with_(timeseries_ts_col=args.timeseries_col)
    if args.timeseries_granularity:
        cfg = cfg.with_(
            timeseries_granularity=args.timeseries_granularity
        )
    if args.relevance_target:
        cfg = cfg.with_(relevance_target=args.relevance_target)
    if args.discover_fds:
        cfg = cfg.with_(discover_fds=True)
    if args.discover_keys:
        cfg = cfg.with_(discover_keys=True)
    if args.layout_advice or args.join_keys:
        cfg = cfg.with_(
            layout_advice=True,
            layout_join_keys=tuple(
                k.strip() for k in (args.join_keys or "").split(",")
                if k.strip()
            ),
        )
    if args.title:
        cfg = cfg.with_(title=args.title)
    if args.description:
        cfg = cfg.with_(dataset_description=args.description)
    if args.dataset_url:
        cfg = cfg.with_(dataset_url=args.dataset_url)
    if args.var_description:
        pairs = []
        for item in args.var_description:
            col, sep, text = item.partition("=")
            if not sep or not col:
                raise SystemExit(
                    f"--var-description expects COL=TEXT, got {item!r}"
                )
            pairs.append((col, text))
        cfg = cfg.with_(
            variable_descriptions=cfg.variable_descriptions + tuple(pairs)
        )
    if args.theme:
        cfg = cfg.with_(html_theme=args.theme)
    if args.primary_color:
        cfg = cfg.with_(html_primary_color=args.primary_color)
    if args.logo:
        cfg = cfg.with_(html_logo=args.logo)
    if args.no_navbar:
        cfg = cfg.with_(html_navbar=False)
    if args.full_width:
        cfg = cfg.with_(html_full_width=True)

    spark = get_session(app_name="spark-profile", master=args.master)
    try:
        if args.fks_catalog:
            from pandas_profiling_personal_spark.operators.checks import (
                discover_inclusions_catalog,
            )

            tabs = {"input": read_table(spark, args.input)}
            for item in args.fks_catalog.split(","):
                nm, _, path = item.partition("=")
                if not nm.strip() or not path.strip():
                    raise SystemExit(
                        f"--fks-catalog: bad entry {item!r} (want NAME=PATH)"
                    )
                nm = nm.strip()
                if nm in tabs:
                    # 'input' is reserved for the profiled table; any other
                    # duplicate would silently replace an earlier entry and
                    # hide the collision in the reported table list
                    raise SystemExit(
                        f"--fks-catalog: table name {nm!r} "
                        + ("is reserved for the profiled input"
                           if nm == "input" else "given twice")
                    )
                tabs[nm] = read_table(spark, path.strip())
            try:
                rows = [
                    r.asDict()
                    for r in discover_inclusions_catalog(tabs).collect()
                ]
            except ValueError as e:
                raise SystemExit(f"--fks-catalog refused: {e}")
            print(json.dumps({
                "tables": sorted(tabs),
                "n_candidates": len(rows),
                "contained": [
                    r for r in rows if r["contained"] and r["exact"]
                    and (r["n_child_distinct"] or 0) > 0
                ],
                "candidates": rows,
            }, default=str))
            return 0
        if args.checks:
            from pandas_profiling_personal_spark.operators import checks as CK

            with open(args.checks, encoding="utf-8") as fh:
                spec = json.load(fh)
            try:
                suite = CK.checks_from_spec(spec)
            except ValueError as e:
                raise SystemExit(f"--checks: {e}")
            if args.checks_from_state:
                from pandas_profiling_personal_spark.plans.incremental import (
                    PartialProfile, checks_of,
                )

                with open(args.input, encoding="utf-8") as fh:
                    part = PartialProfile.from_json(fh.read())
                try:
                    rows = checks_of(part, suite, spark=spark)
                except ValueError as e:
                    raise SystemExit(f"--checks-from-state refused: {e}")
                summary = CK.validation_summary(rows)
            else:
                refs = {}
                for item in (
                    args.checks_refs.split(",") if args.checks_refs else []
                ):
                    name, _, path = item.partition("=")
                    if not name.strip() or not path.strip():
                        raise SystemExit(
                            f"--checks-refs: bad entry {item!r} "
                            "(want NAME=PATH)"
                        )
                    refs[name.strip()] = read_table(spark, path.strip())
                try:
                    res = CK.check_suite(
                        read_table(spark, args.input), suite, refs=refs
                    )
                except ValueError as e:
                    raise SystemExit(f"--checks: {e}")
                rows = [r.asDict() for r in res.collect()]
                summary = CK.validation_summary(rows)
            if args.checks_from_state:
                rows = [dict(r) for r in rows]
            violations = None
            if (
                args.violations > 0
                and not summary["passed"]
                and not args.checks_from_state
            ):
                failed_names = {f["check_name"] for f in summary["failed"]}
                eligible = [
                    c for c in suite
                    if c.name in failed_names
                    and c.kind in CK._VIOLATION_KINDS
                    and not (c.kind == "satisfies" and not c.columns)
                ]
                if eligible:
                    violations = [
                        r.asDict()
                        for r in CK.check_violations(
                            read_table(spark, args.input), eligible,
                            refs=refs, limit=args.violations,
                        ).collect()
                    ]
            if args.output:
                with open(args.output, "w", encoding="utf-8") as fh:
                    fh.write(CK.validation_report_html(
                        rows,
                        title=args.title or f"Validation: {args.input}",
                        violations=violations,
                    ))
            anomalies = None
            if args.checks_log:
                import os

                history = []
                if os.path.exists(args.checks_log):
                    with open(args.checks_log, encoding="utf-8") as fh:
                        history = [
                            json.loads(line)
                            for line in fh if line.strip()
                        ]
                anomalies = CK.metric_anomalies(history, rows)
                with open(args.checks_log, "a", encoding="utf-8") as fh:
                    fh.write(json.dumps(rows, default=str) + "\n")
            print(json.dumps({
                "input": args.input,
                "suite": args.checks,
                "from_state": bool(args.checks_from_state),
                "output": args.output,
                "metric_anomalies": anomalies,
                "violations": violations,
                **summary,
            }))
            if not summary["passed"]:
                return 4
            if args.fail_on_anomaly and anomalies:
                return 5
            return 0
        if args.suggest_checks:
            from pandas_profiling_personal_spark.operators import checks as CK

            if args.checks_from_state:
                # suggest from a saved state with zero rescans: the state
                # shape suggests the completeness/range family only (no
                # exact group visibility — see suggest_checks docstring)
                from pandas_profiling_personal_spark.plans.incremental import (
                    PartialProfile, finalize_partial,
                )

                with open(args.input, encoding="utf-8") as fh:
                    part = PartialProfile.from_json(fh.read())
                variables = finalize_partial(part, spark)["variables"]
                suite = CK.suggest_checks(variables)
            else:
                df_in = read_table(spark, args.input)
                result = profile(df_in, cfg)
                # batch path has the real Spark schema — the suggested
                # suite gates renames/re-types from day one (the state
                # path cannot: VariableType carries no Spark types)
                suite = CK.suggest_checks(
                    result.variables, spark_schema=df_in.schema
                )
            if not suite:
                raise SystemExit(
                    "--suggest-checks: nothing suggestible (no profiled "
                    "columns with counts)"
                )
            discovered_fds = 0
            fd_candidates: "list[dict] | None" = None
            if args.discover_fds:
                if args.checks_from_state:
                    # the SCREEN tier: rank candidates from the persisted
                    # sketches with zero rescans (VERDICT r12 #3); no
                    # contract is declared without the verification melt
                    # — survivors feed a later plain --discover-fds run
                    from pandas_profiling_personal_spark.plans.incremental import (  # noqa: E501
                        discover_fds_of,
                    )

                    try:
                        fd_candidates = discover_fds_of(part, spark)
                    except ValueError as e:
                        raise SystemExit(f"--discover-fds refused: {e}")
                # mined relationships become DECLARED contracts: every
                # exact-verified hold joins the suggested suite. "Nothing
                # survives the prune" (all columns near-unique ids) is
                # zero discovered contracts, not a traceback (ADVICE r12)
                # approximate-FD mining needs a wider screen band: a
                # pair holding at ratio R carries ~1 + (1-R) extra
                # (det, dep) combinations per det, which the exact-FD
                # screen (1.15) would filter before the melt measures it
                margin = (
                    max(1.15, 1.0 + 2.0 * (1.0 - args.fd_min_ratio))
                    if args.fd_min_ratio is not None
                    else 1.15
                )
                try:
                    fd_rows = (
                        [] if args.checks_from_state
                        else CK.discover_fds(
                            df_in, screen_margin=margin
                        ).collect()
                    )
                except ValueError:
                    fd_rows = []
                for r in fd_rows:
                    if not r["exact"]:
                        continue
                    if r["holds"]:
                        suite.append(CK.functional_dependency(
                            r["determinant"], r["dependent"],
                        ))
                        discovered_fds += 1
                    elif (
                        args.fd_min_ratio is not None
                        and r["dependency_ratio"] is not None
                        and r["dependency_ratio"] >= args.fd_min_ratio
                    ):
                        # approximate-FD tier (VERDICT r12 #7): learn the
                        # measured level, gate regressions. The bound
                        # floors the EXACT (n_groups - n_violating) /
                        # n_groups ratio — dependency_ratio is rounded
                        # HALF-UP, so flooring the rounded value could
                        # exceed the true ratio the declared check gates
                        # on and fail on the very frame it was mined from
                        import math as _math

                        exact_ratio = (
                            (r["n_groups"] - r["n_violating"])
                            / r["n_groups"]
                        )
                        floor = max(0.0, _math.floor(
                            exact_ratio * 10**4 - 1e-9
                        ) / 10**4)
                        suite.append(CK.functional_dependency(
                            r["determinant"], r["dependent"],
                            min_ratio=floor,
                        ))
                        discovered_fds += 1
            discovered_keys = 0
            key_screen: "list[dict] | None" = None
            if args.discover_keys:
                if args.checks_from_state:
                    # the SCREEN tier: rank key candidates from the
                    # persisted sketches with zero rescans; no contract
                    # is declared without the verification melt
                    from pandas_profiling_personal_spark.plans.incremental import (  # noqa: E501
                        discover_keys_of,
                    )

                    key_screen = discover_keys_of(part, spark)
                    key_rows = []
                else:
                    try:
                        key_rows = CK.discover_keys(df_in).collect()
                    except ValueError:
                        key_rows = []
                have = {(c.kind, c.columns) for c in suite}
                for r in key_rows:
                    if not (r["is_key"] and r["exact"]):
                        continue
                    # disambiguate by arity (ADVICE r13): a unary key is
                    # ONE column name verbatim — a name containing a comma
                    # must not be split into a bogus composite contract
                    # even when the fragments happen to be real columns
                    if r["arity"] == 1:
                        cols_t = (r["key"],)
                    else:
                        cols_t = tuple(r["key"].split(","))
                        if len(cols_t) != r["arity"]:
                            continue  # component name contains a comma
                    if not all(c in df_in.columns for c in cols_t):
                        continue
                    chk = (CK.primary_key(list(cols_t))
                           if r["null_free"]
                           else CK.uniqueness(list(cols_t)))
                    if (chk.kind, chk.columns) not in have:
                        suite.append(chk)
                        have.add((chk.kind, chk.columns))
                        discovered_keys += 1
            discovered_fks = 0
            if args.discover_fks:
                if args.checks_from_state:
                    raise SystemExit(
                        "--discover-fks needs the raw table (the anti-join "
                        "verification scans it) — not available with "
                        "--checks-from-state"
                    )
                for item in args.discover_fks.split(","):
                    ref_name, _, ref_path = item.partition("=")
                    if not ref_name.strip() or not ref_path.strip():
                        raise SystemExit(
                            f"--discover-fks: bad entry {item!r} "
                            "(want NAME=PATH)"
                        )
                    ref_name, ref_path = ref_name.strip(), ref_path.strip()
                    parent_df = read_table(spark, ref_path)
                    # a contained reference becomes a declared contract
                    # gated later via --checks-refs NAME=PATH; no
                    # type-compatible pairs = zero contracts, not a
                    # traceback (ADVICE r12)
                    try:
                        fk_rows = CK.discover_inclusions(
                            df_in, parent_df
                        ).collect()
                    except ValueError:
                        fk_rows = []
                    for r in fk_rows:
                        if (r["contained"] and r["exact"]
                                and (r["n_child_distinct"] or 0) > 0):
                            suite.append(CK.foreign_key(
                                r["child_column"], ref_name,
                                r["parent_column"],
                                name=(f"fk({r['child_column']}->"
                                      f"{ref_name}.{r['parent_column']})"),
                            ))
                            discovered_fks += 1
            with open(args.suggest_checks, "w", encoding="utf-8") as fh:
                json.dump(CK.checks_to_spec(suite), fh, indent=2, default=str)
            meta_out = {
                "output": args.suggest_checks,
                "n_checks": len(suite),
                "kinds": sorted({c.kind for c in suite}),
                "discovered_fds": discovered_fds,
                "discovered_keys": discovered_keys,
                "discovered_fks": discovered_fks,
            }
            if fd_candidates is not None:
                meta_out["fd_candidates"] = fd_candidates
            if key_screen is not None:
                meta_out["key_candidates"] = key_screen
            print(json.dumps(meta_out))
            return 0
        df = read_table(spark, args.input)
        if args.save_state or args.drift_against:
            import os

            from pyspark.sql import functions as F

            from pandas_profiling_personal_spark.plans.incremental import (
                EmbeddingState,
                PartialProfile,
                embedding_partial,
                histogram_specs_of,
                incremental_drift_report,
                partial_profile,
            )

            cat_pairs = (
                _parse_pairs(args.categorical_pairs)
                if args.categorical_pairs
                else None
            )
            grp_pairs = (
                _parse_pairs(args.group_pairs, "--group-pairs")
                if args.group_pairs
                else None
            )
            fd_prs = (
                _parse_pairs(args.fd_pairs, "--fd-pairs")
                if args.fd_pairs
                else None
            )

            def _load_emb_sidecar(state_path: str):
                """(column, EmbeddingState) from STATE_PATH.emb, or None."""
                p = state_path + ".emb"
                if not os.path.exists(p):
                    return None
                with open(p, encoding="utf-8") as fh:
                    d = json.load(fh)
                return d["column"], EmbeddingState(**d["state"])

            def _load_ts_sidecar(state_path: str):
                """TimeseriesState from STATE_PATH.ts, or None."""
                from pandas_profiling_personal_spark.plans.incremental import (  # noqa: E501
                    TimeseriesState,
                )

                p = state_path + ".ts"
                if not os.path.exists(p):
                    return None
                with open(p, encoding="utf-8") as fh:
                    return TimeseriesState.from_json(fh.read())

            def _ts_numeric_cols() -> list[str]:
                from pyspark.sql import types as T

                return [
                    f.name
                    for f in df.schema.fields
                    if isinstance(f.dataType, T.NumericType)
                ][:20]

            def _dim_and_extents(col: str) -> dict:
                """ONE scan for the fresh-baseline path: per-vector-size
                counts AND finite-norm extents (modal size = inferred dim)
                — folding what were two separate full passes."""
                from pandas_profiling_personal_spark.operators.similarity import (  # noqa: E501
                    as_double,
                    l2_norm,
                )

                v = as_double(F.col(col))
                finite = F.forall(
                    v,
                    lambda x: x.isNotNull()
                    & ~F.isnan(x)
                    & ~x.isin(float("inf"), float("-inf")),
                )
                norm = F.when(finite, l2_norm(v))
                rows = (
                    df.where(F.col(col).isNotNull())
                    .groupBy(F.size(v).alias("d"))
                    .agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.min(norm).alias("lo"),
                        F.max(norm).alias("hi"),
                    )
                    .collect()
                )
                return {
                    int(r["d"]): r
                    for r in rows
                    if r["d"] is not None and r["d"] > 0
                }
            if args.save_state:
                if args.align_state:
                    with open(args.align_state, encoding="utf-8") as fh:
                        prev = PartialProfile.from_json(fh.read())
                    specs = histogram_specs_of(prev) or None
                    corr = prev.pairs is not None
                    if cat_pairs is None and prev.cat_pairs is not None:
                        # mergeable contingency: reuse the stored state's
                        # declared pairs, the same contract as the edges
                        cat_pairs = list(prev.cat_pairs)
                    elif (
                        cat_pairs is not None
                        and prev.cat_pairs is not None
                        and set(cat_pairs) != set(prev.cat_pairs)
                    ):
                        # same contract as the --drift-against path: an
                        # explicit flag that disagrees with the aligned
                        # state must refuse by name HERE, not die later in
                        # merge_partials with a bare 'pair sets differ'
                        raise SystemExit(
                            "--categorical-pairs disagrees with the "
                            "aligned state's declared pairs "
                            f"{sorted(prev.cat_pairs)} — shards merge "
                            "like with like; drop the flag (stored pairs "
                            "are reused automatically) or re-save the "
                            "baseline with the new pairs"
                        )
                    if grp_pairs is None and prev.group_pairs is not None:
                        # mergeable eta^2 cells: stored pairs carry
                        # forward, same contract as the contingency pairs
                        grp_pairs = list(prev.group_pairs)
                    elif (
                        grp_pairs is not None
                        and prev.group_pairs is not None
                        and set(grp_pairs) != set(prev.group_pairs)
                    ):
                        raise SystemExit(
                            "--group-pairs disagrees with the aligned "
                            "state's declared pairs "
                            f"{sorted(prev.group_pairs)} — shards merge "
                            "like with like; drop the flag (stored pairs "
                            "are reused automatically) or re-save the "
                            "baseline with the new pairs"
                        )
                    if fd_prs is None and prev.pair_hlls is not None:
                        # fd-pair sketches carry forward, same contract
                        fd_prs = list(prev.pair_hlls)
                    elif (
                        fd_prs is not None
                        and prev.pair_hlls is not None
                        and {tuple(sorted(p)) for p in fd_prs}
                        != set(prev.pair_hlls)
                    ):
                        raise SystemExit(
                            "--fd-pairs disagrees with the aligned "
                            "state's declared pairs "
                            f"{sorted(prev.pair_hlls)} — shards merge "
                            "like with like; drop the flag (stored pairs "
                            "are reused automatically) or re-save the "
                            "baseline with the new pairs"
                        )
                else:
                    specs, corr = args.state_bins, True
                try:
                    part = partial_profile(
                        df,
                        histograms=specs,
                        correlations=corr,
                        categorical_pairs=cat_pairs,
                        group_pairs=grp_pairs,
                        fd_pairs=fd_prs,
                    )
                except ValueError as e:
                    # e.g. the alignment honesty guard (shard range entirely
                    # outside the stored edges): a named refusal, not a
                    # traceback — the message carries the re-edging recipe
                    raise SystemExit(f"--save-state refused: {e}")
                emb_out = None
                prev_emb = (
                    _load_emb_sidecar(args.align_state)
                    if args.align_state
                    else None
                )
                emb_col = args.embedding_col
                if emb_col is None and prev_emb is not None:
                    # an aligned state's sidecar carries forward without
                    # re-declaring the flag — the same contract as the
                    # stored histogram edges and contingency pairs (a
                    # forgotten flag must not silently drop embedding
                    # tracking out of the daily loop)
                    emb_col = prev_emb[0]
                if emb_col:
                    if emb_col not in df.columns:
                        raise SystemExit(
                            f"embedding column {emb_col!r} is not in the "
                            f"input (columns: {sorted(df.columns)})"
                        )
                    if prev_emb is not None:
                        # shared-edges contract, like the histograms: the
                        # stored sidecar fixes column/dim/bins/norm edges
                        ecol, pe = prev_emb
                        if ecol != emb_col:
                            raise SystemExit(
                                "--embedding-col disagrees with the "
                                f"aligned state's sidecar column {ecol!r}"
                            )
                        if (
                            args.embedding_dim
                            and args.embedding_dim != pe.dim
                        ):
                            raise SystemExit(
                                f"--embedding-dim {args.embedding_dim} "
                                "disagrees with the aligned sidecar's dim "
                                f"{pe.dim} — aligned states must share "
                                "dim/edges; drop the flag or re-save the "
                                "baseline at the new dimensionality"
                            )
                        dim, bins_, edges = pe.dim, pe.bins, (pe.lo, pe.hi)
                    else:
                        by_d = _dim_and_extents(emb_col)
                        if args.embedding_dim:
                            dim = args.embedding_dim
                        elif by_d:
                            dim = sorted(
                                by_d.items(),
                                key=lambda kv: (-kv[1]["cnt"], kv[0]),
                            )[0][0]
                        else:
                            raise SystemExit(
                                f"--embedding-col {emb_col!r}: no "
                                "non-null vectors to infer a "
                                "dimensionality from — pass "
                                "--embedding-dim"
                            )
                        r = by_d.get(dim)
                        if r is None or r["lo"] is None:
                            raise SystemExit(
                                f"--embedding-col {emb_col!r}: no valid "
                                f"{dim}-dim finite vectors"
                            )
                        edges = (float(r["lo"]), float(r["hi"]))
                        bins_ = 10
                    emb = embedding_partial(df, emb_col, dim, edges, bins_)
                    emb_out = args.save_state + ".emb"
                    with open(emb_out, "w", encoding="utf-8") as fh:
                        json.dump(
                            {
                                "column": emb_col,
                                "state": json.loads(emb.to_json()),
                            },
                            fh,
                        )
                # time-series sidecar (STATE.ts): additive grid cells over
                # the numeric columns — the same carry-forward contract as
                # the embedding sidecar (an aligned state's declared
                # ts_col/granularity/columns are reused; explicit
                # disagreement refuses by name)
                ts_out = None
                prev_ts = (
                    _load_ts_sidecar(args.align_state)
                    if args.align_state
                    else None
                )
                ts_col = args.timeseries_col
                if ts_col is None and prev_ts is not None:
                    ts_col = prev_ts.ts_col
                if ts_col:
                    from pandas_profiling_personal_spark.plans.incremental import (  # noqa: E501
                        timeseries_partial,
                    )

                    if ts_col not in df.columns:
                        raise SystemExit(
                            f"--timeseries-col {ts_col!r} is not in the "
                            f"input (columns: {sorted(df.columns)})"
                        )
                    gran = args.timeseries_granularity or "hour"
                    if prev_ts is not None:
                        if args.timeseries_col and (
                            args.timeseries_col != prev_ts.ts_col
                        ):
                            raise SystemExit(
                                "--timeseries-col disagrees with the "
                                "aligned state's sidecar column "
                                f"{prev_ts.ts_col!r} — structure compares "
                                "like with like; drop the flag or re-save "
                                "the baseline"
                            )
                        if args.timeseries_granularity and (
                            args.timeseries_granularity
                            != prev_ts.granularity
                        ):
                            raise SystemExit(
                                "--timeseries-granularity disagrees with "
                                "the aligned sidecar's granularity "
                                f"{prev_ts.granularity!r}"
                            )
                        gran = prev_ts.granularity
                        ts_cols = [
                            c for c in prev_ts.columns if c in df.columns
                        ]
                        if not ts_cols:
                            raise SystemExit(
                                "--align-state: none of the aligned "
                                "time-series sidecar's columns "
                                f"{prev_ts.columns} exist in today's "
                                "input — re-save the baseline"
                            )
                    else:
                        ts_cols = [
                            c for c in _ts_numeric_cols() if c != ts_col
                        ]
                        if not ts_cols:
                            raise SystemExit(
                                f"--timeseries-col {ts_col!r}: no numeric "
                                "columns to track"
                            )
                    tstate = timeseries_partial(df, ts_col, ts_cols, gran)
                    ts_out = args.save_state + ".ts"
                    with open(ts_out, "w", encoding="utf-8") as fh:
                        fh.write(tstate.to_json())
                with open(args.save_state, "w", encoding="utf-8") as fh:
                    fh.write(part.to_json())
                print(json.dumps({
                    "output": args.save_state,
                    "n": part.n,
                    "n_columns": len(part.columns),
                    "aligned_to": args.align_state,
                    "embedding_state": emb_out,
                    "timeseries_state": ts_out,
                }))
                return 0
            with open(args.drift_against, encoding="utf-8") as fh:
                prev = PartialProfile.from_json(fh.read())
            stored_pairs = (
                list(prev.cat_pairs) if prev.cat_pairs is not None else None
            )
            if cat_pairs is not None:
                # an explicitly requested association analysis must not
                # silently vanish (stored state has no pairs) or die in a
                # 'disjoint' traceback (different pairs) — refuse by name
                if stored_pairs is None:
                    raise SystemExit(
                        "--categorical-pairs with --drift-against: the "
                        f"stored state {args.drift_against} carries no "
                        "contingency pairs — re-save the baseline with "
                        "--categorical-pairs first"
                    )
                if set(cat_pairs) != set(stored_pairs):
                    raise SystemExit(
                        "--categorical-pairs disagrees with the stored "
                        f"state's declared pairs {sorted(stored_pairs)} — "
                        "association compares like with like; drop the "
                        "flag (stored pairs are reused automatically) or "
                        "re-save the baseline"
                    )
            try:
                cur = partial_profile(
                    df,
                    histograms=histogram_specs_of(prev) or None,
                    categorical_pairs=stored_pairs,
                )
            except ValueError as e:
                raise SystemExit(f"--drift-against refused: {e}")
            emb_a = emb_b = None
            sidecar = _load_emb_sidecar(args.drift_against)
            if args.embedding_col and sidecar is None:
                raise SystemExit(
                    "--embedding-col with --drift-against: the stored "
                    f"state {args.drift_against} has no .emb sidecar — "
                    "re-save the baseline with --embedding-col first"
                )
            if sidecar is not None:
                ecol, emb_a = sidecar
                if args.embedding_col and args.embedding_col != ecol:
                    raise SystemExit(
                        "--embedding-col disagrees with the stored "
                        f"sidecar column {ecol!r}"
                    )
                if ecol not in df.columns:
                    raise SystemExit(
                        "--drift-against: the stored embedding sidecar "
                        f"column {ecol!r} is not in today's input "
                        f"(columns: {sorted(df.columns)}) — if the column "
                        "was renamed/dropped, re-save the baseline"
                    )
                # the stored sidecar fixes dim/bins/edges (shared-edges
                # contract); a norm range that moved past the stored edges
                # clamps VISIBLY into the boundary buckets, and the
                # per-dimension mean-shift signal is range-free either way
                emb_b = embedding_partial(
                    df, ecol, emb_a.dim, (emb_a.lo, emb_a.hi), emb_a.bins
                )
                if emb_b.n == 0:
                    # zero valid vectors at the stored dim IS total drift
                    # (e.g. a 16->32 dim migration) — the drift arithmetic
                    # would return all-None signals and the report would
                    # read 'no embedding drift', the worst possible answer
                    raise SystemExit(
                        "--drift-against refused: today's input has ZERO "
                        f"valid finite {emb_a.dim}-dim vectors in "
                        f"{ecol!r} (baseline n={emb_a.n}) — if the "
                        "embedder's dimensionality changed, that is total "
                        "drift: re-save the baseline at the new "
                        "dimensionality rather than reading a silent "
                        "'no embedding drift'"
                    )
            # time-series structure drift (STATE.ts sidecar): seasonality /
            # trend / autocorrelation deltas, zero extra full-table passes
            # beyond today's one grid aggregate; surfaced in the JSON
            # summary (flagged columns by name)
            ts_drift = None
            cur_ts = None
            ts_sidecar = _load_ts_sidecar(args.drift_against)
            if args.timeseries_col and ts_sidecar is None:
                raise SystemExit(
                    "--timeseries-col with --drift-against: the stored "
                    f"state {args.drift_against} has no .ts sidecar — "
                    "re-save the baseline with --timeseries-col first"
                )
            if ts_sidecar is not None:
                from pandas_profiling_personal_spark.plans.incremental import (  # noqa: E501
                    timeseries_drift_between,
                    timeseries_partial,
                )

                if args.timeseries_col and (
                    args.timeseries_col != ts_sidecar.ts_col
                ):
                    raise SystemExit(
                        "--timeseries-col disagrees with the stored "
                        f"sidecar column {ts_sidecar.ts_col!r}"
                    )
                if ts_sidecar.ts_col not in df.columns:
                    raise SystemExit(
                        "--drift-against: the stored time-series sidecar "
                        f"column {ts_sidecar.ts_col!r} is not in today's "
                        "input — re-save the baseline"
                    )
                cols_today = [
                    c for c in ts_sidecar.columns if c in df.columns
                ]
                cur_ts = timeseries_partial(
                    df,
                    ts_sidecar.ts_col,
                    cols_today,
                    ts_sidecar.granularity,
                )
                ts_drift = timeseries_drift_between(ts_sidecar, cur_ts)
            out = args.output or (args.input.rsplit(".", 1)[0] + ".html")
            title = args.title or (
                f"Drift: {args.drift_against} vs {args.input}"
            )
            from pandas_profiling_personal_spark.plans.incremental import (
                schema_drift_between_partials,
            )

            # computed ONCE: the HTML report and the JSON summary must
            # read the same schema diff
            schema_changes = schema_drift_between_partials(prev, cur)
            with open(out, "w", encoding="utf-8") as fh:
                fh.write(
                    incremental_drift_report(
                        prev, cur, emb_a, emb_b,
                        ts_a=ts_sidecar, ts_b=cur_ts, title=title,
                        schema_drift=schema_changes,
                    )
                )
            print(json.dumps({
                "output": out, "n_a": prev.n, "n_b": cur.n,
                "embedding": sidecar is not None,
                "timeseries_drift": ts_drift,
                "timeseries_flagged": sorted(
                    c for c, d in (ts_drift or {}).items() if d["flagged"]
                ),
                "schema_drift": schema_changes,
            }))
            return 0
        if args.corpus_report:
            from pandas_profiling_personal_spark.plans.corpus import (
                corpus_profile,
                corpus_report_html,
            )

            ctx = args.context_len or args.chunk or 2048
            rep = corpus_profile(
                df, args.id_col, args.text_col, context_len=ctx,
                segment_by=args.segment_by,
                domain_from=args.domain_from,
                media_col=args.media_col,
            )
            out = args.output or (args.input.rsplit(".", 1)[0] + ".html")
            title = args.title or f"Corpus report: {args.input}"
            if out.endswith(".json"):
                with open(out, "w", encoding="utf-8") as fh:
                    json.dump(rep, fh, indent=2, default=str)
            else:
                with open(out, "w", encoding="utf-8") as fh:
                    fh.write(corpus_report_html(rep, title))
            print(json.dumps({
                "output": out,
                "n_docs": rep["table"]["n_docs"],
                "p_duplicates": rep["duplication"]["p_duplicates"],
                "pii_doc_rate": rep["pii"].get("pii_doc_rate"),
            }))
            return 0
        if args.prepare_corpus:
            from pandas_profiling_personal_spark.operators.pipeline import (
                corpus_funnel,
                funnel_report,
                prepare_corpus,
            )
            from pandas_profiling_personal_spark.sources.writers import (
                write_table,
                write_training_shards,
            )

            bench = (
                read_table(spark, args.decontaminate)
                if args.decontaminate
                else None
            )
            kw = dict(
                line_filter=not args.no_line_filter, benchmark=bench
            )
            if args.near_dup_jaccard is not None:
                kw["near_dup"] = {"min_jaccard": args.near_dup_jaccard}
            # ONE funnel execution: persisted flags feed both the report
            # and the surviving-corpus filter (the quality stage dominates
            # corpus cost — running the funnel twice doubles the job)
            flags = corpus_funnel(
                df, args.id_col, args.text_col, **kw
            ).persist()
            try:
                rep = funnel_report(flags).collect()[0].asDict()
                out_df = prepare_corpus(
                    df,
                    args.id_col,
                    args.text_col,
                    chunk_tokens=args.chunk,
                    overlap_tokens=args.overlap,
                    flags=flags,
                )
                if args.shards:
                    key = "chunk_id" if args.chunk else args.id_col
                    write_training_shards(
                        out_df, args.prepare_corpus, key, args.shards,
                        mode="overwrite",
                    )
                else:
                    write_table(
                        out_df, args.prepare_corpus, mode="overwrite"
                    )
            finally:
                flags.unpersist()
            print(json.dumps({"output": args.prepare_corpus, **rep}))
            return 0
        result = profile(df, cfg, progress=_progress_renderer(args))
        out = args.output or (args.input.rsplit(".", 1)[0] + ".html")
        if args.compare:
            from pandas_profiling_personal_spark.report.compare import (
                compare_profiles,
                comparison_to_html,
            )

            result_b = profile(read_table(spark, args.compare), cfg)
            cmp = compare_profiles(result, result_b)
            title = args.title or f"{args.input} vs {args.compare}"
            if out.endswith(".json"):
                with open(out, "w", encoding="utf-8") as fh:
                    json.dump(cmp, fh, indent=2, default=str)
            else:
                with open(out, "w", encoding="utf-8") as fh:
                    fh.write(comparison_to_html(cmp, title))
            print(json.dumps({
                "output": out,
                "added": cmp["variables"]["added"],
                "removed": cmp["variables"]["removed"],
                "changed": len(cmp["variables"]["changed"]),
                "new_alerts": len(cmp["alerts"]["new"]),
            }))
            return 0
        title = args.title or f"Profile of {args.input}"
        if out.endswith(".json"):
            with open(out, "w", encoding="utf-8") as fh:
                fh.write(result.to_json(indent=2))
        elif out.endswith(".md"):
            # Markdown dataset card — the committable artifact a published
            # training set ships with (metadata + stats + variables +
            # alerts + layout advice)
            from pandas_profiling_personal_spark.report.card import (
                card_to_file,
            )

            card_to_file(result, out)
        else:
            html_report.to_file(result, out, title)
        print(json.dumps({"output": out, "n_rows": result.table["n"],
                          "n_vars": result.table["n_var"],
                          "n_alerts": len(result.alerts)}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
