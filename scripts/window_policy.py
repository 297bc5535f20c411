"""Driver-window rotation policy, derived from evidence instead of
hand-curated comment lists (VERDICT r11 #4).

The driver records only the FIRST ``WINDOW`` entries of
``__spark_entry__._SPECS`` into CORRECTNESS_r{N}.json each round. With
more specs than slots, the window must rotate so every SQL-backed spec
keeps fresh driver evidence. The policy:

1. **Never-recorded first.** A SQL-backed spec the driver has NEVER
   recorded green must be in the window — no kin exception can excuse it.
2. **Oldest-evidence next.** An out-of-window spec must not be strictly
   older (by latest green round) than any in-window spec, unless
   ``KIN_EXCEPTIONS`` maps it to an in-window spec that exercises the
   same machinery (ties are fine: equal-age rows may sit either side).

``evidence_rounds()`` unions every CORRECTNESS_r*.json at the repo root
(a spec counts as recorded when its row has ``rows_match`` and no
``err``); ``violations()`` returns human-readable policy breaches, which
``tests/test_window_policy.py`` asserts empty. Run this file directly to
print the evidence table and the next rotation's in/out candidates.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

#: spec -> why it was TOUCHED in the previous round (implementation change
#: that could alter its plan or results). Rule 0 (VERDICT r14 #7): a
#: touched spec whose latest driver evidence predates the newest evidence
#: round must be IN the window, outranking the pure age rule — a spec
#: changed after its last oracle run has no fresh driver proof.
TOUCHED_PREV_ROUND: dict[str, str] = {
    "fk_catalog_tpch": (
        "r14 checks.py tolerant-stats/_inclusion_family change (commit "
        "b4bbcc6) landed the same round the spec rotated out — no driver "
        "evidence since"
    ),
}

#: out-of-window spec -> the in-window kin whose green exercises the same
#: machinery. Only consulted when the out spec is strictly older than some
#: in-window spec; each entry documents WHY the exception is sound.
KIN_EXCEPTIONS: dict[str, str] = {
    # same exact-percentile tier (median-of-medians rides the exact
    # quantile pass numeric_summary pins)
    "mad_lineitem": "numeric_summary_nation",
    # the SAME value_counts operator over a different table/column
    "value_counts_returnflag": "value_counts_event_type",
    # same bounded date_trunc grid machinery (period aggregation)
    "seasonal_profile_events": "seasonal_decompose_events",
    # same stable-grid + scaled-integer window machinery (the anomaly
    # threshold rides the decomposition's residual surface); displaced
    # mid-r12 to admit the new fd_discovery spec
    "ts_anomaly_events": "seasonal_decompose_events",
    # the same distinct-reduced anti-join FK machinery, generalized: the
    # discovery spec verifies containment through the identical join
    # shape the declared check gates on; displaced mid-r12 to admit the
    # new fk_discovery spec
    "referential_integrity_lineitem": "fk_discovery_orders_customer",
}


def evidence_rounds() -> dict[str, int]:
    """Latest round each spec was recorded green by the driver
    (rows_match and no err); specs never recorded are absent."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if row.get("rows_match") and not row.get("err"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def violations() -> list[str]:
    import __spark_entry__ as E

    latest = evidence_rounds()
    specs = list(E._SPECS)
    sql_backed = {n for n, s in E._SPECS.items() if s[1] is not None}
    window = specs[:WINDOW]
    window_set = set(window)
    tail = [s for s in specs[WINDOW:] if s in sql_backed]

    out: list[str] = []
    # rule 0 (VERDICT r14 #7): a spec touched last round without driver
    # evidence since must be in the window — outranks the age rule
    newest_any = max(latest.values(), default=-1)
    for s in tail:
        if s in TOUCHED_PREV_ROUND and latest.get(s, -1) < newest_any:
            out.append(
                f"{s}: touched last round ({TOUCHED_PREV_ROUND[s]}) with "
                f"evidence r{latest.get(s, -1)} older than the newest "
                f"round r{newest_any}, but outside the window"
            )
    # rule 1: never-recorded SQL-backed specs must be in the window
    for s in tail:
        if s not in latest:
            out.append(
                f"{s}: never driver-recorded but outside the "
                f"{WINDOW}-row window — no kin exception can excuse it"
            )
    # rule 2: an out spec strictly older than an in spec needs a valid kin
    if any(s in latest for s in window_set):
        newest_in = max(
            (latest.get(s, -1) for s in window), default=-1
        )
    else:
        newest_in = -1
    for s in tail:
        if s not in latest:
            continue  # already flagged by rule 1
        if latest[s] < newest_in:
            kin = KIN_EXCEPTIONS.get(s)
            if kin is None:
                out.append(
                    f"{s}: evidence r{latest[s]} is older than the newest "
                    f"in-window row (r{newest_in}) and has no "
                    "KIN_EXCEPTIONS entry"
                )
            elif kin not in window_set:
                out.append(
                    f"{s}: kin exception points at {kin!r}, which is not "
                    "in the window"
                )
    # hygiene: kin map must reference real specs
    for s, kin in KIN_EXCEPTIONS.items():
        if s not in E._SPECS or kin not in E._SPECS:
            out.append(f"KIN_EXCEPTIONS names unknown spec: {s} -> {kin}")
    return out


def propose_window() -> list[str]:
    """Mechanically derive the next round's window: never-recorded
    SQL-backed specs first, then touched-last-round specs lacking
    newest-round evidence (rule 0), then everything else oldest-evidence
    first (ties broken by current literal order). First ``WINDOW`` names."""
    import __spark_entry__ as E

    latest = evidence_rounds()
    newest_any = max(latest.values(), default=-1)
    specs = [n for n, s in E._SPECS.items() if s[1] is not None]
    order = {n: i for i, n in enumerate(E._SPECS)}

    def rank(s: str) -> tuple:
        never = s not in latest
        touched = (
            s in TOUCHED_PREV_ROUND and latest.get(s, -1) < newest_any
        )
        return (
            0 if never else (1 if touched else 2),
            latest.get(s, -1),
            order[s],
        )

    return sorted(specs, key=rank)[:WINDOW]


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    latest = evidence_rounds()
    specs = list(E._SPECS)
    print(f"{'idx':>4} {'where':6} {'evidence':>8}  spec")
    for i, s in enumerate(specs):
        where = "WINDOW" if i < WINDOW else "tail"
        ev = f"r{latest[s]:02d}" if s in latest else "never"
        print(f"{i:>4} {where:6} {ev:>8}  {s}")
    probs = violations()
    print(f"\nviolations: {len(probs)}")
    for p in probs:
        print(" -", p)


if __name__ == "__main__":
    main()
