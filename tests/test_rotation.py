"""The registry's declared order IS the rotation order.

scripts/rotation.py derives the driver-correctness window order from the
CORRECTNESS_r0*.json attestation history (oldest-attestation-first, never-
attested queries leading).  These tests pin the registry to that order so
the window contract can't drift the way the hand-maintained comments once
did (round-3 ADVICE caught a miscount).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from iceberg_examples_spark.registry import QUERIES  # noqa: E402
from scripts.rotation import (  # noqa: E402
    WINDOW,
    expected_order,
    latest_green_round,
)


def test_registry_order_is_rotation_order():
    names = list(QUERIES)
    assert names == expected_order(names)


def test_window_leads_with_never_attested():
    """Every never-attested query sits inside the driver window (or, if
    there are ever more than WINDOW of them, they fill it entirely)."""
    names = list(QUERIES)
    latest = latest_green_round()
    never = [q for q in names if q not in latest]
    window = set(names[:WINDOW])
    missing = [q for q in never[:WINDOW] if q not in window]
    assert not missing, f"never-attested queries outside window: {missing}"


def test_untracked_artifact_does_not_shift_order(tmp_path):
    """Round-6 and round-7 verdicts: the driver drops CORRECTNESS_rN.json
    into the working tree AFTER the registry order froze, which used to
    redden this suite at judge time.  The order is now derived from
    git-TRACKED artifacts only, so an untracked future artifact must not
    change the expected order.  Simulated here by writing a fake
    CORRECTNESS_r99.json next to the real ones in a git-tracked copy —
    cheaper: assert directly that _tracked_artifacts() excludes a file
    that exists on disk but is not in the index."""
    import json
    import shutil

    from scripts.rotation import REPO, _tracked_artifacts

    before = _tracked_artifacts(REPO)
    fake = os.path.join(REPO, "CORRECTNESS_r98.json")
    assert not os.path.exists(fake), "leftover fixture from a crashed run"
    try:
        with open(fake, "w") as f:
            json.dump(
                {q: {"rows_match": True, "schema_match": True, "hash_match": True}
                 for q in list(QUERIES)[:3]},
                f,
            )
        after = _tracked_artifacts(REPO)
        assert after == before, "untracked artifact leaked into rotation input"
        names = list(QUERIES)
        assert names == expected_order(names)
    finally:
        os.unlink(fake)
    # The glob fallback (no git) is exercised by copying artifacts to a
    # bare directory: there, everything on disk legitimately counts.
    for p in before[:1]:
        shutil.copy(p, tmp_path)
    assert _tracked_artifacts(str(tmp_path)), "glob fallback found nothing"


def test_attestation_history_parses():
    """Sanity: the driver files exist and still parse. An absolute floor
    (not a ratio): newly declared queries are legitimately unattested
    until the next driver round, so a ratio check fails exactly when
    coverage WIDENS mid-round — the wrong incentive. Round 5 attested
    156 distinct queries; parsing must never recover fewer."""
    latest = latest_green_round()
    covered = set(QUERIES) & set(latest)
    assert len(covered) >= 156


def test_tracked_but_deleted_artifact_is_skipped(tmp_path):
    """git ls-files lists a tracked entry even after the file is removed
    from the worktree; the rotation input must skip it, not crash."""
    import shutil
    import subprocess

    from scripts.rotation import _tracked_artifacts, latest_green_round

    repo = tmp_path / "r"
    repo.mkdir()
    subprocess.run(["git", "-C", str(repo), "init", "-q"], check=True)
    for n in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        shutil.copy(os.path.join(REPO, n), repo / n)
    subprocess.run(
        ["git", "-C", str(repo), "add", "-A"], check=True
    )
    subprocess.run(
        ["git", "-C", str(repo), "-c", "user.email=t@t", "-c",
         "user.name=t", "commit", "-qm", "x"],
        check=True,
    )
    (repo / "CORRECTNESS_r02.json").unlink()  # tracked but deleted
    paths = _tracked_artifacts(str(repo))
    assert [os.path.basename(p) for p in paths] == ["CORRECTNESS_r01.json"]
    assert latest_green_round(str(repo))  # parses without crashing


def test_git_zero_tracked_does_not_fall_back_to_glob(tmp_path):
    """When git SUCCEEDS but tracks no artifacts (first round, or all
    tracked artifacts deleted from the worktree), the answer is [] — not
    the untracked glob, which would reintroduce the order drift the
    tracked-only rule exists to prevent (round-8 ADVICE)."""
    import shutil
    import subprocess

    from scripts.rotation import _tracked_artifacts

    repo = tmp_path / "r"
    repo.mkdir()
    subprocess.run(["git", "-C", str(repo), "init", "-q"], check=True)
    # an artifact exists on disk but is NOT in the index
    shutil.copy(
        os.path.join(REPO, "CORRECTNESS_r01.json"),
        repo / "CORRECTNESS_r01.json",
    )
    assert _tracked_artifacts(str(repo)) == []
