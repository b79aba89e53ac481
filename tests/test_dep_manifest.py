"""Structural rewrite-invalidation (r8 verdict, next-round #2).

``_REWRITTEN_IN`` was hand-curated through r8 and provably missed three
rewrites (q_dedup_prefix's r6/r7 kernel restructure; the
q_table_skipping pair reading through the r5 external-manifest rework).
These tests make the invalidation structural: any content change to a
CORE module (functions/ lakehouse/ operators/ streaming/ sources/
pipelines/ plans/ session.py) now fails the suite until the developer
records an explicit decision via tools/dep_manifest.py — either a
semantic rewrite (which requires ``_REWRITTEN_IN`` bumps for every
oracle-paired query whose transitive import closure reaches the module,
so the driver re-verifies them) or a reviewed-no-semantic-change
allowlist entry with a justification in the manifest's audit trail.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import dep_manifest as dm  # noqa: E402

from lab5_lakehouse_etl_spark.queries import (  # noqa: E402
    _REWRITTEN_IN,
    _driver_verified,
    load_all,
)

load_all()


def test_manifest_current_no_unrecorded_core_drift():
    """Every core module's content hash matches tests/dep_manifest.json.

    A mismatch means a functions/lakehouse/operators/streaming-level
    change landed without deciding whether it invalidates the driver
    rows of the queries that read through it — exactly the failure mode
    the r8 verdict caught by hand. The fix is never to edit the JSON
    directly: run ``python tools/dep_manifest.py`` to see the affected
    queries, then re-run with ``--rewritten N`` (after adding
    ``_REWRITTEN_IN`` entries) or ``--allow REASON``.
    """
    manifest = dm.load_manifest()
    hashes = dm.current_hashes()
    drift = dm.drift(manifest, hashes)
    if drift:
        changed = {m for m, kind in drift.items() if kind != "removed"}
        affected = dm.affected_queries(changed)
        lines = [f"  {kind:8s} {mod}" for mod, kind in sorted(drift.items())]
        qlines = [
            f"  {q}: {', '.join(mods)}" for q, mods in sorted(affected.items())
        ]
        raise AssertionError(
            "core-module drift without a recorded decision:\n"
            + "\n".join(lines)
            + (
                f"\ninvalidates driver rows of {len(affected)} "
                "oracle-paired queries:\n" + "\n".join(qlines)
                if affected
                else ""
            )
            + "\nrun: python tools/dep_manifest.py --rewritten N | --allow REASON"
        )


def test_rewrite_decisions_backed_by_registry_entries():
    """A manifest entry recorded as a semantic rewrite at round N is only
    honest if every oracle-paired query depending on that module either
    carries ``_REWRITTEN_IN >= N`` or has since been driver-verified at
    round >= N. (The tool enforces this at update time; this re-checks
    continuously so hand-edits of either side can't drift apart.)"""
    manifest = dm.load_manifest()
    rewrites: dict[str, tuple[int, set[str] | None]] = {}
    for mod, rec in manifest.get("modules", {}).items():
        if rec.get("action") == "rewrite":
            rewrites[mod] = (rec["round"], None)
        elif rec.get("action") == "rewrite-scoped":
            # a scoped decision narrows the bump obligation to the
            # recorded scope; the tool verified out_of_scope_reason at
            # decision time and the audit trail carries it
            rewrites[mod] = (rec["round"], set(rec.get("scope", ())))
    if not rewrites:
        return
    deps = dm.query_dependencies()
    from lab5_lakehouse_etl_spark.queries import ORACLES

    verified = _driver_verified()
    bad: list[str] = []
    for q, qdeps in deps.items():
        if q not in ORACLES:
            continue
        need = 0
        for m in qdeps:
            if m not in rewrites:
                continue
            rnd, scope = rewrites[m]
            if scope is None or q in scope:
                need = max(need, rnd)
        if need and _REWRITTEN_IN.get(q, 0) < need and verified.get(q, 0) < need:
            bad.append(f"{q} (needs >= r{need})")
    assert not bad, (
        "rewrite-recorded modules with unbumped dependent queries: "
        + ", ".join(sorted(bad))
    )


def test_import_graph_resolves_known_dependencies():
    """Pin the AST analyzer on the three r8-verdict misses: the analyzer
    must see exactly the dependency edges whose absence from the
    hand-curated map caused the original gap."""
    deps = dm.query_dependencies()
    assert "lab5_lakehouse_etl_spark.functions.dedup" in deps["q_dedup_prefix"]
    assert "lab5_lakehouse_etl_spark.lakehouse.table" in deps["q_table_skipping"]
    assert (
        "lab5_lakehouse_etl_spark.lakehouse.table"
        in deps["q_table_skipping_dist"]
    )
    # relative-import resolution: streaming queries reach streaming/events
    assert (
        "lab5_lakehouse_etl_spark.streaming.events" in deps["q_stream_tumbling"]
    )
    # every registered query resolves to at least the session module
    # (all queries build on the shared SparkSession factory) — guards
    # against the analyzer silently returning empty closures
    empty = [q for q, d in deps.items() if not d]
    assert not empty, f"queries with empty dependency closures: {empty}"


def test_drift_classifies_added_changed_removed():
    """drift() taxonomy on a synthetic manifest: content change,
    new module, and deleted module each classified correctly."""
    hashes = {"m.kept": "aaa", "m.changed": "new", "m.added": "xxx"}
    manifest = {
        "modules": {
            "m.kept": {"sha256": "aaa"},
            "m.changed": {"sha256": "old"},
            "m.removed": {"sha256": "zzz"},
        }
    }
    assert dm.drift(manifest, hashes) == {
        "m.changed": "changed",
        "m.added": "added",
        "m.removed": "removed",
    }
    assert dm.drift(manifest, {m: r["sha256"] for m, r in manifest["modules"].items()}) == {}


def test_manifest_history_preserved_on_update(tmp_path, monkeypatch):
    """Accepting drift APPENDS the superseded decision to the module's
    history instead of overwriting it — the audit-trail property the
    round-9 self-review found missing (three successive round-9
    decisions on functions/dedup.py had collapsed to the last one)."""
    import json
    import subprocess
    import sys

    mpath = tmp_path / "dep_manifest.json"
    monkeypatch.setattr(dm, "MANIFEST_PATH", str(mpath))
    # seed: one module, old hash, one decision
    mpath.write_text(json.dumps({
        "round": 9,
        "modules": {
            "lab5_lakehouse_etl_spark.session": {
                "sha256": "stale", "action": "allow",
                "note": "first decision", "round": 9,
            }
        },
    }))
    hashes = dm.current_hashes()
    manifest = dm.load_manifest()
    d = dm.drift(manifest, hashes)
    assert d  # the real tree differs from the seeded stale state
    # replicate main()'s accept path (allow) without argv plumbing
    mods = manifest["modules"]
    for mod, kind in d.items():
        if kind == "removed":
            del mods[mod]
            continue
        prev = mods.get(mod)
        history = []
        if prev:
            history = prev.get("history", []) + [
                {k: prev[k] for k in ("action", "note", "round") if k in prev}
            ]
        mods[mod] = {
            "sha256": hashes[mod], "action": "allow",
            "note": "second decision", "round": 9,
            **({"history": history} if history else {}),
        }
    rec = mods["lab5_lakehouse_etl_spark.session"]
    assert rec["note"] == "second decision"
    assert rec["history"][-1]["note"] == "first decision"


def test_baseline_anchored_to_committed_state():
    """The r9 self-review's ordering hazard, made structural (r9 verdict
    next-round #3): the manifest's hashes must certify a COMMITTED
    round-start state, never a dirty mid-round tree.  Every core module
    hash in the manifest must either match the module's content at
    ``baseline_commit`` (untouched since the round-start stamp) or carry
    an explicit decision from ``baseline_round`` or later (adjudicated
    via --rewritten/--allow after the stamp).  A manifest baselined
    AFTER a mid-round core edit — the exact blind window round 9 hit
    with the tokenizer change — fails here, because the drifted hash
    matches neither the anchored commit nor a recorded decision."""
    import pytest

    manifest = dm.load_manifest()
    commit = manifest.get("baseline_commit")
    base_round = manifest.get("baseline_round")
    assert commit and base_round, (
        "manifest lacks a round-start stamp — run "
        "python tools/dep_manifest.py --stamp-round N at round start"
    )
    committed = dm.hashes_at_commit(commit)
    if committed is None:
        pytest.skip("git unavailable or not a checkout (copied tree)")
    if dm.git_head() is None:
        pytest.skip("git HEAD unavailable")
    bad: list[str] = []
    for mod, rec in manifest.get("modules", {}).items():
        if committed.get(mod) == rec["sha256"]:
            continue  # untouched since the anchored commit
        if rec.get("round", -1) >= base_round:
            continue  # explicitly adjudicated this round or later
        bad.append(mod)
    assert not bad, (
        "manifest hashes that match neither the baseline commit "
        f"{commit[:12]} nor a decision from round >= {base_round} "
        f"(hand-edit or pre-baseline drift): {sorted(bad)}"
    )


def test_baseline_round_not_stale():
    """The stamp must move every round: a baseline_round older than the
    newest driver CORRECTNESS round means someone started a new round's
    core work against the previous round's anchor."""
    import glob
    import re

    manifest = dm.load_manifest()
    base_round = manifest.get("baseline_round", 0)
    newest = 0
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            newest = max(newest, int(m.group(1)))
    assert base_round >= newest, (
        f"baseline_round {base_round} predates the newest driver round "
        f"{newest} — re-stamp at round start (--stamp-round {newest + 1})"
    )


def test_unscope_moves_query_and_preserves_history(tmp_path, monkeypatch):
    """--unscope (r16 scope correction) moves the query from scope to
    out_of_scope on every rewrite-scoped record naming it, records the
    reviewer reason, and preserves the superseded record in history —
    and never touches hashes."""
    import json

    mpath = tmp_path / "dep_manifest.json"
    monkeypatch.setattr(dm, "MANIFEST_PATH", str(mpath))
    mpath.write_text(json.dumps({
        "round": 15,
        "modules": {
            "m.scoped": {
                "sha256": "h1", "action": "rewrite-scoped", "round": 15,
                "scope": ["q_a", "q_b"], "out_of_scope": ["q_c"],
                "out_of_scope_reason": "orig",
            },
            "m.allow": {"sha256": "h2", "action": "allow", "round": 15},
        },
    }))
    assert dm.unscope("q_b", "artifact of bundled decision") == 0
    out = json.loads(mpath.read_text())
    rec = out["modules"]["m.scoped"]
    assert rec["scope"] == ["q_a"]
    assert rec["out_of_scope"] == ["q_b", "q_c"]
    assert rec["sha256"] == "h1"
    assert rec["scope_amendments"][-1]["unscoped"] == "q_b"
    assert rec["history"][-1]["scope"] == ["q_a", "q_b"]
    # untouched record untouched; unknown query refused
    assert "history" not in out["modules"]["m.allow"]
    assert dm.unscope("q_missing", "x") == 1


def test_retroactive_entries_from_r8_verdict_present():
    """The three r4-era rows the r8 verdict named must stay invalidated
    until a driver row at/after their rework round exists."""
    assert _REWRITTEN_IN.get("q_dedup_prefix", 0) >= 7
    assert _REWRITTEN_IN.get("q_table_skipping", 0) >= 5
    assert _REWRITTEN_IN.get("q_table_skipping_dist", 0) >= 5


def test_stamp_refuses_unadjudicated_drift(tmp_path, monkeypatch, capsys):
    """--stamp-round must never baseline away un-decided core drift —
    that is exactly the r9 blind window it exists to close."""
    import json

    mpath = tmp_path / "dep_manifest.json"
    monkeypatch.setattr(dm, "MANIFEST_PATH", str(mpath))
    # seed a manifest whose one recorded module hash is stale
    mpath.write_text(json.dumps({
        "round": 9,
        "modules": {
            "lab5_lakehouse_etl_spark.session": {"sha256": "stale"},
        },
    }))
    assert dm.stamp_round(10) == 1
    assert "REFUSED" in capsys.readouterr().err
    # and the manifest was not touched
    assert json.loads(mpath.read_text())["round"] == 9


def test_stamp_refuses_core_dirty_vs_head(tmp_path, monkeypatch, capsys):
    """A baseline computed from a tree whose core modules differ from
    git HEAD certifies uncommitted state — refused."""
    import json

    mpath = tmp_path / "dep_manifest.json"
    monkeypatch.setattr(dm, "MANIFEST_PATH", str(mpath))
    # manifest matches the CURRENT tree (no drift)...
    hashes = dm.current_hashes()
    mpath.write_text(json.dumps({
        "round": 9,
        "modules": {m: {"sha256": h} for m, h in hashes.items()},
    }))
    # ...but git HEAD claims different content for one module
    real = dm.hashes_at_commit

    def fake(commit, repo=dm.REPO):
        out = dict(real(commit, repo))
        k = next(iter(out))
        out[k] = "different"
        return out

    monkeypatch.setattr(dm, "hashes_at_commit", fake)
    import pytest

    if dm.git_head() is None:
        pytest.skip("git unavailable")
    assert dm.stamp_round(10) == 1
    assert "differ from HEAD" in capsys.readouterr().err


def test_stamp_succeeds_and_anchors_on_clean_committed_tree(
    tmp_path, monkeypatch
):
    """Happy path: no drift + core == HEAD → baseline_round and
    baseline_commit recorded."""
    import json

    import pytest

    if dm.git_head() is None:
        pytest.skip("git unavailable")
    committed = dm.hashes_at_commit(dm.git_head())
    if committed != dm.current_hashes():
        pytest.skip("working tree has uncommitted core changes")
    mpath = tmp_path / "dep_manifest.json"
    monkeypatch.setattr(dm, "MANIFEST_PATH", str(mpath))
    mpath.write_text(json.dumps({
        "round": 9,
        "modules": {m: {"sha256": h} for m, h in committed.items()},
    }))
    assert dm.stamp_round(11) == 0
    out = json.loads(mpath.read_text())
    assert out["baseline_round"] == 11
    assert out["baseline_commit"] == dm.git_head()
    assert out["round"] == 11
