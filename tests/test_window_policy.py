"""The driver-window rotation policy is enforced by CODE (VERDICT r11
#4): the window (first 50 _SPECS entries — the only rows the driver
records) must hold every never-recorded SQL-backed spec, and no
out-of-window spec may be strictly older than an in-window one without an
explicit, valid kin exception. Zero Spark — pure driver arithmetic over
CORRECTNESS_r*.json."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "scripts")
)


def test_window_matches_evidence_policy():
    import window_policy as WP

    probs = WP.violations()
    assert probs == [], "window rotation policy violated:\n" + "\n".join(
        probs
    )


def test_policy_detects_a_planted_violation(monkeypatch):
    """The checker is live, not vacuous: demoting a never-recorded spec
    out of the window (by rotating the spec dict) must trip rule 1."""
    import __spark_entry__ as E
    import window_policy as WP

    latest = WP.evidence_rounds()
    specs = list(E._SPECS)
    never = [
        s for s in specs[: WP.WINDOW]
        if s not in latest and E._SPECS[s][1] is not None
    ]
    if not never:  # driver has recorded everything — plant differently
        never = [s for s in specs[: WP.WINDOW] if E._SPECS[s][1] is not None][:1]
        monkeypatch.setattr(
            WP, "evidence_rounds",
            lambda _l=latest, _s=never[0]: {
                k: v for k, v in _l.items() if k != _s
            },
        )
    # rotate the first never-recorded spec to the END of the dict
    demoted = dict(E._SPECS)
    val = demoted.pop(never[0])
    demoted[never[0]] = val
    monkeypatch.setattr(E, "_SPECS", demoted)
    probs = WP.violations()
    assert any(never[0] in p and "never" in p for p in probs), probs


def test_evidence_ages_are_current():
    """No SQL-backed spec's driver evidence may be more than 3 rounds
    old (the freshness bar the rotation exists to maintain); specs never
    recorded must be in-window so THIS round records them."""
    import __spark_entry__ as E
    import window_policy as WP

    latest = WP.evidence_rounds()
    if not latest:
        return  # fresh clone without artifacts
    current = max(latest.values())
    stale = {
        s: r for s, r in latest.items()
        if s in E._SPECS and r < current - 2
    }
    window = set(list(E._SPECS)[: WP.WINDOW])
    really_stale = {s: r for s, r in stale.items() if s not in window}
    assert really_stale == {}, (
        f"specs with evidence older than r{current - 2} sitting outside "
        f"the window: {really_stale}"
    )
