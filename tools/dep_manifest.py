#!/usr/bin/env python3
"""Structural rewrite-invalidation manifest (r8 verdict, next-round #2).

The registry's ``_REWRITTEN_IN`` map (queries/__init__.py) invalidates
stale driver-green rows after a query's code path is rewritten — but
through round 8 it was hand-curated, and the r8 verdict proved it has
misses (q_dedup_prefix's kernel was restructured in r6/r7 with no
entry; the q_table_skipping pair read through the r5 external-manifest
rework of lakehouse/table.py).  A driver row older than the code it
certifies is not evidence.

This tool makes the invalidation STRUCTURAL:

* it derives, via AST import analysis, the transitive set of CORE
  modules (everything in the package except ``queries/``) each
  registered query depends on;
* it records a sha256 per core module in ``tests/dep_manifest.json``;
* ``tests/test_dep_manifest.py`` fails whenever a core module's
  content hash differs from the manifest — naming the oracle-paired
  queries whose green rows the change silently invalidates — until the
  developer re-runs this tool with an explicit decision:

    --rewritten N   the change is semantic; every affected query must
                    already carry ``_REWRITTEN_IN >= N`` (the tool
                    verifies this before accepting the new hash), so
                    the driver re-verifies them before their old rows
                    count again;
    --allow REASON  the change is reviewed-no-semantic-change (comment
                    edits, docstrings, dead-code removal); REASON is
                    recorded in the manifest's audit trail.

Core-module set: functions/ lakehouse/ operators/ streaming/ sources/
pipelines/ plans/ session.py — i.e. everything a query reads through
that is NOT its own defining queries/ module.  queries/ modules are
excluded because adding a new query to e.g. dedup_ops.py must not flag
every existing dedup query; per-query code changes inside a queries/
module still require a manual ``_REWRITTEN_IN`` entry (the docstring
discipline the registry already documents).

Round-start discipline (r9 verdict "What's wrong" #1): the manifest
must be (re)baselined BEFORE any core edit of the round, or changes
landing before the baseline are invisible to the gate.  ``--stamp-round
N`` makes that structural: it refuses unless the working tree's core
modules are drift-free AND byte-identical to git HEAD, then records
``baseline_round`` and ``baseline_commit``.  tests/test_dep_manifest.py
verifies every manifest hash either matches the module's content AT
``baseline_commit`` (via ``git show``) or carries a decision from
``baseline_round`` or later — so a baseline computed from a dirty
mid-round tree cannot masquerade as round-start state.

Scoped rewrites: ``--rewritten N --scope q1,q2 --scope-reason "..."``
records a semantic rewrite whose blast radius is NARROWER than the
module-granular dependency closure (e.g. a change to one helper family
inside functions/text.py).  The tool verifies the scoped queries carry
``_REWRITTEN_IN >= N`` and records the reviewer's justification for
every affected-but-out-of-scope query in the audit trail.  Module
granularity stays the conservative default; scope is an explicit,
recorded reviewer decision, never inferred.

Scope amendment: ``--unscope QUERY --unscope-reason "..."`` corrects a
recorded rewrite-scoped decision by moving QUERY from ``scope`` to
``out_of_scope`` on every module record that names it — for the case
where one bundled decision covered several modules and a query landed
in the shared scope list through a module that did not semantically
affect it (the module that DID has since been re-adjudicated).  The
amendment is a reviewer decision like --scope itself: the reason is
recorded per module and the superseded record is preserved in history,
so the audit trail shows both states.  It never touches hashes.

Usage:
    python tools/dep_manifest.py                 # report drift
    python tools/dep_manifest.py --deps q_name   # show a query's deps
    python tools/dep_manifest.py --rewritten 9   # accept, semantic
    python tools/dep_manifest.py --rewritten 10 --scope q_a,q_b \
        --scope-reason "..."                     # accept, scoped
    python tools/dep_manifest.py --allow "..."   # accept, no-semantic
    python tools/dep_manifest.py --stamp-round 10  # round-start baseline
    python tools/dep_manifest.py --unscope q_x \
        --unscope-reason "..."                   # scope correction
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "lab5_lakehouse_etl_spark"
PKG_DIR = os.path.join(REPO, PKG)
MANIFEST_PATH = os.path.join(REPO, "tests", "dep_manifest.json")


def _package_modules() -> dict[str, str]:
    """{dotted.module.name: repo-relative path} for every .py in the package."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO)
            dotted = rel[: -len(".py")].replace(os.sep, ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            out[dotted] = rel
    return out


def _resolve(name: str, modules: dict[str, str]) -> str | None:
    """Resolve a dotted name to a package module: the module itself, or
    the deepest parent module/package that exists (an attribute import
    ``from ..functions import dedup`` resolves ``functions.dedup`` if it
    is a module, else ``functions``)."""
    parts = name.split(".")
    while parts:
        cand = ".".join(parts)
        if cand in modules:
            return cand
        parts.pop()
    return None


def _imports_of(dotted: str, rel_path: str, modules: dict[str, str]) -> set[str]:
    """Package-internal modules imported by one module (direct edges)."""
    with open(os.path.join(REPO, rel_path), "rb") as fh:
        tree = ast.parse(fh.read(), filename=rel_path)
    # the importing module's package (for relative-import resolution)
    is_pkg = rel_path.endswith("__init__.py")
    self_pkg = dotted if is_pkg else dotted.rsplit(".", 1)[0]
    edges: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name == PKG or alias.name.startswith(PKG + "."):
                    r = _resolve(alias.name, modules)
                    if r:
                        edges.add(r)
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                base = node.module or ""
                if not (base == PKG or base.startswith(PKG + ".")):
                    continue
            else:
                # climb node.level - 1 packages up from self_pkg
                parts = self_pkg.split(".")
                up = node.level - 1
                if up >= len(parts):
                    continue
                parts = parts[: len(parts) - up]
                base = ".".join(parts + ([node.module] if node.module else []))
            for alias in node.names:
                r = _resolve(f"{base}.{alias.name}", modules) or _resolve(
                    base, modules
                )
                if r:
                    edges.add(r)
    edges.discard(dotted)
    return edges


def import_graph() -> tuple[dict[str, str], dict[str, set[str]]]:
    modules = _package_modules()
    graph = {
        dotted: _imports_of(dotted, rel, modules)
        for dotted, rel in modules.items()
    }
    return modules, graph


def _closure(start: str, graph: dict[str, set[str]]) -> set[str]:
    seen: set[str] = set()
    stack = [start]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        stack.extend(graph.get(cur, ()))
    return seen


def is_core(dotted: str) -> bool:
    """Core = in-package, not the queries/ layer, not the package root
    __init__ (a pure re-export surface)."""
    if dotted == PKG:
        return False
    sub = dotted[len(PKG) + 1 :]
    return not (sub == "queries" or sub.startswith("queries."))


def query_dependencies() -> dict[str, list[str]]:
    """{query_name: sorted core modules reachable from its defining
    queries/ module}.  Imports the registry (no SparkSession needed)."""
    sys.path.insert(0, REPO)
    from lab5_lakehouse_etl_spark.queries import QUERIES, load_all  # noqa: PLC0415

    load_all()

    _modules, graph = import_graph()
    closure_cache: dict[str, set[str]] = {}
    deps: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        mod = fn.__module__
        if mod not in closure_cache:
            closure_cache[mod] = _closure(mod, graph)
        deps[name] = sorted(d for d in closure_cache[mod] if is_core(d))
    return deps


def current_hashes() -> dict[str, str]:
    modules = _package_modules()
    out: dict[str, str] = {}
    for dotted, rel in modules.items():
        if not is_core(dotted):
            continue
        with open(os.path.join(REPO, rel), "rb") as fh:
            out[dotted] = hashlib.sha256(fh.read()).hexdigest()
    return out


def load_manifest() -> dict:
    try:
        with open(MANIFEST_PATH) as fh:
            return json.load(fh)
    except OSError:
        return {"modules": {}}


def drift(manifest: dict, hashes: dict[str, str]) -> dict[str, str]:
    """{module: 'changed'|'added'|'removed'} vs the manifest."""
    recorded = manifest.get("modules", {})
    out: dict[str, str] = {}
    for mod, h in hashes.items():
        if mod not in recorded:
            out[mod] = "added"
        elif recorded[mod]["sha256"] != h:
            out[mod] = "changed"
    for mod in recorded:
        if mod not in hashes:
            out[mod] = "removed"
    return out


def affected_queries(mods: set[str]) -> dict[str, list[str]]:
    """{query: [changed modules it depends on]} for oracle-paired queries."""
    sys.path.insert(0, REPO)
    from lab5_lakehouse_etl_spark.queries import ORACLES, load_all  # noqa: PLC0415

    load_all()

    deps = query_dependencies()
    out: dict[str, list[str]] = {}
    for q, qdeps in deps.items():
        hit = sorted(set(qdeps) & mods)
        if hit and q in ORACLES:
            out[q] = hit
    return out


def git_head(repo: str = REPO) -> str | None:
    """Current HEAD commit, or None outside a git checkout."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return out.stdout.strip() if out.returncode == 0 else None


def hashes_at_commit(commit: str, repo: str = REPO) -> dict[str, str] | None:
    """{core module: sha256 of its content at COMMIT}; None if git is
    unavailable. Modules absent at the commit are omitted."""
    import subprocess

    modules = _package_modules()
    out: dict[str, str] = {}
    for dotted, rel in modules.items():
        if not is_core(dotted):
            continue
        try:
            r = subprocess.run(
                ["git", "-C", repo, "show", f"{commit}:{rel}"],
                capture_output=True, timeout=30,
            )
        except (OSError, subprocess.TimeoutExpired):
            return None
        if r.returncode == 0:
            out[dotted] = hashlib.sha256(r.stdout).hexdigest()
    return out


def stamp_round(rnd: int) -> int:
    """Record the round-start baseline: refuses unless the tree is
    drift-free vs the manifest AND core modules are byte-identical to
    git HEAD (the baseline must certify a COMMITTED state — r9's blind
    window came from baselining after a mid-round core edit)."""
    manifest = load_manifest()
    hashes = current_hashes()
    d = drift(manifest, hashes)
    if d:
        print(
            "REFUSED: un-adjudicated core drift — decide it first "
            f"(--rewritten/--allow): {sorted(d)}",
            file=sys.stderr,
        )
        return 1
    if rnd < manifest.get("round", 0):
        print(
            f"REFUSED: stamp round {rnd} < manifest round "
            f"{manifest['round']}", file=sys.stderr,
        )
        return 1
    head = git_head()
    if head is None:
        print("REFUSED: git HEAD unavailable", file=sys.stderr)
        return 1
    committed = hashes_at_commit(head)
    if committed is None:
        print("REFUSED: cannot read core modules at HEAD", file=sys.stderr)
        return 1
    dirty = sorted(
        m for m, h in hashes.items() if committed.get(m) != h
    )
    if dirty:
        print(
            f"REFUSED: core modules differ from HEAD (commit them first): "
            f"{dirty}", file=sys.stderr,
        )
        return 1
    manifest["round"] = max(manifest.get("round", 0), rnd)
    manifest["baseline_round"] = rnd
    manifest["baseline_commit"] = head
    with open(MANIFEST_PATH, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"baseline stamped: round {rnd} @ {head[:12]}")
    return 0


def unscope(query: str, reason: str) -> int:
    """Move ``query`` from ``scope`` to ``out_of_scope`` on every
    rewrite-scoped module record naming it (see module docstring —
    bundled-decision scope correction).  Preserves the superseded
    record in history; never touches hashes."""
    manifest = load_manifest()
    touched: list[str] = []
    for mod, rec in manifest.get("modules", {}).items():
        if rec.get("action") != "rewrite-scoped":
            continue
        scope = list(rec.get("scope", ()))
        if query not in scope:
            continue
        keep = (
            "action", "note", "round",
            "scope", "out_of_scope", "out_of_scope_reason",
        )
        history = rec.get("history", []) + [
            {k: rec[k] for k in keep if k in rec}
        ]
        rec["scope"] = sorted(s for s in scope if s != query)
        rec["out_of_scope"] = sorted(
            set(rec.get("out_of_scope", ())) | {query}
        )
        amendments = list(rec.get("scope_amendments", ()))
        amendments.append({"unscoped": query, "reason": reason})
        rec["scope_amendments"] = amendments
        rec["history"] = history
        touched.append(mod)
    if not touched:
        print(f"no rewrite-scoped record names {query}", file=sys.stderr)
        return 1
    with open(MANIFEST_PATH, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"unscoped {query} from: {', '.join(sorted(touched))}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--deps", metavar="QUERY", help="print a query's core deps")
    ap.add_argument(
        "--rewritten",
        type=int,
        metavar="ROUND",
        help="accept drift as a semantic rewrite landing in ROUND; every "
        "affected oracle-paired query must carry _REWRITTEN_IN >= ROUND",
    )
    ap.add_argument(
        "--scope",
        metavar="Q1,Q2,...",
        help="with --rewritten: the rewrite's true blast radius — only "
        "these queries need _REWRITTEN_IN >= ROUND; requires "
        "--scope-reason justifying why the other module-closure "
        "dependents are semantically untouched",
    )
    ap.add_argument(
        "--scope-reason",
        metavar="TEXT",
        help="reviewer justification recorded for every affected-but-"
        "out-of-scope query (required with --scope)",
    )
    ap.add_argument(
        "--allow",
        metavar="REASON",
        help="accept drift as reviewed-no-semantic-change, recording REASON",
    )
    ap.add_argument(
        "--stamp-round",
        type=int,
        metavar="ROUND",
        help="record the round-start baseline (requires a clean, committed "
        "core tree); see module docstring",
    )
    ap.add_argument(
        "--unscope",
        metavar="QUERY",
        help="scope correction: move QUERY out of every rewrite-scoped "
        "record's scope (requires --unscope-reason); see module docstring",
    )
    ap.add_argument(
        "--unscope-reason",
        metavar="TEXT",
        help="reviewer justification recorded with --unscope",
    )
    args = ap.parse_args()

    if args.unscope is not None:
        if not args.unscope_reason:
            print("REFUSED: --unscope requires --unscope-reason", file=sys.stderr)
            return 1
        return unscope(args.unscope, args.unscope_reason)

    if args.stamp_round is not None:
        return stamp_round(args.stamp_round)

    if args.deps:
        deps = query_dependencies()
        if args.deps not in deps:
            print(f"unknown query: {args.deps}", file=sys.stderr)
            return 2
        print("\n".join(deps[args.deps]))
        return 0

    manifest = load_manifest()
    hashes = current_hashes()
    d = drift(manifest, hashes)
    if not d:
        print("manifest current: no core-module drift")
        return 0

    changed = {m for m, kind in d.items() if kind != "removed"}
    affected = affected_queries(changed)
    print("core-module drift vs tests/dep_manifest.json:")
    for mod, kind in sorted(d.items()):
        print(f"  {kind:8s} {mod}")
    if affected:
        print(f"\naffected oracle-paired queries ({len(affected)}):")
        for q, mods in sorted(affected.items()):
            print(f"  {q}: {', '.join(mods)}")

    if args.rewritten is None and args.allow is None:
        print(
            "\nno decision given — re-run with --rewritten ROUND (after "
            "adding _REWRITTEN_IN entries) or --allow REASON",
            file=sys.stderr,
        )
        return 1

    if args.rewritten is not None:
        sys.path.insert(0, REPO)
        from lab5_lakehouse_etl_spark.queries import (  # noqa: PLC0415
            _REWRITTEN_IN,
        )

        scope: set[str] | None = None
        extra: dict[str, object] = {}
        if args.scope is not None:
            if not args.scope_reason:
                print("REFUSED: --scope requires --scope-reason", file=sys.stderr)
                return 1
            scope = {s.strip() for s in args.scope.split(",") if s.strip()}
            unknown = scope - set(affected)
            if unknown:
                print(
                    f"\nREFUSED: scoped queries not in the affected set "
                    f"(typo, or not oracle-paired dependents): "
                    f"{', '.join(sorted(unknown))}",
                    file=sys.stderr,
                )
                return 1
            extra = {
                "scope": sorted(scope),
                "out_of_scope": sorted(set(affected) - scope),
                "out_of_scope_reason": args.scope_reason,
            }

        must_bump = scope if scope is not None else set(affected)
        missing = [
            q
            for q in must_bump
            if _REWRITTEN_IN.get(q, 0) < args.rewritten
        ]
        if missing:
            print(
                f"\nREFUSED: these affected queries lack _REWRITTEN_IN >= "
                f"{args.rewritten}: {', '.join(sorted(missing))}",
                file=sys.stderr,
            )
            return 1
        action = "rewrite" if scope is None else "rewrite-scoped"
        note = f"round {args.rewritten}"
        rnd = args.rewritten
    else:
        action, note = "allow", args.allow
        rnd = manifest.get("round", 0)
        extra = {}

    mods_out = manifest.get("modules", {})
    for mod, kind in d.items():
        if kind == "removed":
            del mods_out[mod]
        else:
            prev = mods_out.get(mod)
            # keep an in-file audit TRAIL, not just the latest decision:
            # within round 9 alone one module carried three successive
            # decisions (merge_covered_spans → simhash64 → ngram helper),
            # and overwriting left the manifest asserting only the last
            # one — false for the round as a whole
            history = []
            if prev:
                keep = (
                    "action", "note", "round",
                    "scope", "out_of_scope", "out_of_scope_reason",
                )
                history = prev.get("history", []) + [
                    {k: prev[k] for k in keep if k in prev}
                ]
            mods_out[mod] = {
                "sha256": hashes[mod],
                "action": action,
                "note": note,
                "round": rnd,
                **extra,
                **({"history": history} if history else {}),
            }
    manifest["modules"] = dict(sorted(mods_out.items()))
    manifest["round"] = max(manifest.get("round", 0), rnd)
    with open(MANIFEST_PATH, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"\nmanifest updated ({action}: {note})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
