#!/usr/bin/env python
"""Compute (and optionally apply) the next driver correctness window.

The driver grades exactly the FIRST 50 registry entries each round
(`CORRECTNESS_r{N}.json`), so choosing what gets (re-)graded is pure
ordering work in ``aws_lakehouse_spark/plans/__init__.py``'s
``_PRIORITY`` list. This tool makes each rotation mechanical:

    python tools/rotate_window.py                  # print the next window
    python tools/rotate_window.py name ...         # pin names to the front
    python tools/rotate_window.py --changed        # pin queries whose code
                                                   # changed since their last
                                                   # green driver grade
    python tools/rotate_window.py --apply ...      # rewrite _PRIORITY

Selection contract (round-8 revision):

- a query is GRADED once any ``CORRECTNESS_r*.json`` row for it is
  fully green (rows + schema + hash); its LAST green round is the
  round whose code state that grade certifies;
- pinned queries lead the window, in the order given. Pins may be
  already-graded — a re-graded query is a RE-VERIFY slot, which is the
  whole point once coverage debt is cleared (round-7 advice: the old
  refusal made it impossible for the driver to ever re-certify a
  rewritten query);
- rows-only specs (oracle=None) are still refused as pins: the
  driver's weaker rows-only check doesn't certify anything a pin
  should claim;
- after pins, never-graded oracle-backed queries fill remaining slots
  in alphabetical order (the queue order documented since round 5);
- any space left is padded with the LONGEST-AGO-re-verified queries
  (earliest LAST-green round first, alphabetical within a round) so
  every slot still re-verifies something.

``--changed`` is the standing rule from the round-7 verdict: **a
plan-shape change re-enters the next window automatically.** Round-10
revision (r9 verdict item 2): the taint unit is now the query's
TRANSITIVE CODE-OBJECT FINGERPRINT (``tools/code_fingerprint.py`` —
sha256 over the builder's bytecode closure: every package function /
class / referenced module-level constant it can actually execute,
plus its oracle SQL), compared between the current head and the
query's last-green driver commit (computed in a throwaway worktree —
fingerprints are path- and line-number-independent, so no state file
is needed). The old FILE-level import-closure rule re-tainted
essentially the whole registry on any shared-module edit (r8 and r9
both closed at 278/328 stale — mathematically unable to converge at
50 grades/round); the fingerprint rule taints only queries whose
executed code actually changed (measured at the r10 head: an edit to
``operators/joins.py``'s widen classifier taints the 21 callers of
``widen_if_underparallel``, not 328). Changed → pinned, stalest grade
first. The fingerprint can in principle under-approximate through
dynamic dispatch the bytecode walker cannot see (getattr on computed
names); the per-round 328/328 head parity artifacts are the standing
backstop for that class, and ``--changed-files`` keeps the old
over-approximating rule available for comparison. If more queries
changed than fit (window minus never-graded debt), the overflow is
printed as DEFERRED so the next rotation carries it.

``--apply`` rewrites only the literal list between ``_PRIORITY = [``
and the ``index 50 boundary`` marker, leaving the surrounding
commentary for the committer to update by hand (the comment explains
WHY a window was chosen; a tool shouldn't pretend to know that).
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "aws_lakehouse_spark"
INIT_PATH = os.path.join(REPO, PKG, "plans", "__init__.py")
WINDOW = 50


def graded_by_round() -> dict[str, int]:
    """query -> EARLIEST round with a fully green driver row."""
    earliest: dict[str, int] = {}
    for name, rnd in _green_rows():
        earliest.setdefault(name, rnd)
    return earliest


def graded_latest() -> dict[str, int]:
    """query -> LATEST round with a fully green driver row.

    This is the round whose code state the standing grade certifies —
    staleness padding and ``--changed`` tainting both key off it.
    """
    latest: dict[str, int] = {}
    for name, rnd in _green_rows():
        latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _green_rows():
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                yield name, rnd


# --- the standing rule: plan-shape change => next-window pin ---------


def round_commits() -> dict[int, str]:
    """round number -> the driver's grading commit for that round."""
    out: dict[int, str] = {}
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            # log is newest-first; keep the newest commit per round
            out.setdefault(int(m.group(1)), sha)
    return out


def _module_files() -> dict[str, str]:
    """package module name -> repo-relative file path."""
    out: dict[str, str] = {}
    pkg_root = os.path.join(REPO, PKG)
    for path in glob.glob(os.path.join(pkg_root, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, REPO)
        mod = rel[: -len(".py")].replace(os.sep, ".")
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        out[mod] = rel
    return out


def _imports_of(path: str) -> set[str]:
    """Package-internal module names imported by a source file."""
    try:
        tree = ast.parse(open(os.path.join(REPO, path)).read())
    except SyntaxError:  # pragma: no cover - package must parse
        return set()
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    mods.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module and node.module.startswith(PKG):
                mods.add(node.module)
                # `from pkg.sub import name` may import a MODULE name
                for alias in node.names:
                    mods.add(f"{node.module}.{alias.name}")
    return mods


def taint_files(entry_module: str) -> set[str]:
    """Repo-relative source files reachable from ``entry_module``
    through package-internal imports (including the entry itself)."""
    files = _module_files()
    seen: set[str] = set()
    frontier = [entry_module]
    while frontier:
        mod = frontier.pop()
        path = files.get(mod)
        if path is None or path in seen:
            continue
        seen.add(path)
        frontier.extend(m for m in _imports_of(path) if m in files)
    return seen


def _changed_since(sha: str) -> set[str]:
    """Repo-relative package files changed (committed or not) since sha."""
    diff = subprocess.run(
        ["git", "diff", "--name-only", sha, "--", PKG],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return {line.strip() for line in diff.splitlines() if line.strip()}


def changed_pins_files() -> list[str]:
    """The pre-r10 FILE-level rule: graded queries whose import-closure
    files changed since their last grade. Kept for comparison
    (``--changed-files``) — over-approximates so badly after a
    shared-module edit that the backlog cannot converge."""
    from aws_lakehouse_spark.plans import REGISTRY

    latest = graded_latest()
    commits = round_commits()
    changed_cache: dict[int, set[str]] = {}
    pins: list[tuple[int, str]] = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None or name not in latest:
            continue
        rnd = latest[name]
        sha = commits.get(rnd)
        if sha is None:
            continue
        if rnd not in changed_cache:
            changed_cache[rnd] = _changed_since(sha)
        if not changed_cache[rnd]:
            continue
        entry = spec.fn.__module__
        if taint_files(entry) & changed_cache[rnd]:
            pins.append((rnd, name))
    return [name for _, name in sorted(pins)]


def fingerprints_at(sha: str) -> dict[str, str]:
    """Registry fingerprints computed from the package AS OF ``sha``,
    via a throwaway worktree + subprocess (the fingerprint logic
    always comes from the CURRENT tree's tools/code_fingerprint.py —
    old checkouts predate it)."""
    import shutil
    import subprocess
    import tempfile

    tree = tempfile.mkdtemp(prefix=f"rw_fp_{sha[:10]}_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", "--force", tree, sha],
            cwd=REPO,
            capture_output=True,
            check=True,
        )
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "code_fingerprint.py"),
                "--tree",
                tree,
            ],
            capture_output=True,
            text=True,
            check=True,
            cwd=tempfile.gettempdir(),
        ).stdout
        return json.loads(out)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", tree],
            cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(tree, ignore_errors=True)


def changed_pins() -> list[str]:
    """Graded queries whose transitive code-object fingerprint (or
    oracle SQL) changed since their last-green driver commit, stalest
    last-green round first (alphabetical within a round). A query
    missing from its grade-round registry (rename) counts as
    changed."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from code_fingerprint import registry_fingerprints

    from aws_lakehouse_spark.plans import REGISTRY

    latest = graded_latest()
    commits = round_commits()
    current = registry_fingerprints()
    old_cache: dict[int, dict[str, str]] = {}
    pins: list[tuple[int, str]] = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None or name not in latest:
            continue
        rnd = latest[name]
        sha = commits.get(rnd)
        if sha is None:
            continue
        if rnd not in old_cache:
            old_cache[rnd] = fingerprints_at(sha)
        if old_cache[rnd].get(name) != current.get(name):
            pins.append((rnd, name))
    return [name for _, name in sorted(pins)]


# --- window assembly -------------------------------------------------


def next_window(pinned: list[str]) -> list[str]:
    from aws_lakehouse_spark.plans import REGISTRY

    latest = graded_latest()
    oracle_backed = [n for n, s in REGISTRY.items() if s.oracle is not None]
    unknown = [n for n in pinned if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown pinned queries: {unknown}")
    if len(set(pinned)) != len(pinned):
        dupes = sorted({n for n in pinned if pinned.count(n) > 1})
        raise SystemExit(f"duplicate pinned queries: {dupes}")
    if len(pinned) > WINDOW:
        # more pins than slots would silently overflow the window via
        # the negative fill slice below — refuse instead
        raise SystemExit(
            f"{len(pinned)} pinned queries exceed the {WINDOW}-slot window"
        )
    rows_only = [n for n in pinned if REGISTRY[n].oracle is None]
    if rows_only:
        # the driver's rows-only check can't certify what a pin claims
        raise SystemExit(
            f"pinned queries excluded from window: "
            f"{ {n: 'rows-only (oracle=None)' for n in rows_only} }"
        )
    ungraded = sorted(n for n in oracle_backed if n not in latest)
    window = list(pinned)
    window += [n for n in ungraded if n not in window][
        : max(0, WINDOW - len(window))
    ]
    if len(window) < WINDOW:
        # pad with the stalest standing grades for re-verification
        stale = sorted(
            (n for n in oracle_backed if n not in window),
            key=lambda n: (latest.get(n, 0), n),
        )
        window += stale[: WINDOW - len(window)]
    return window


def apply_window(window: list[str]) -> None:
    src = open(INIT_PATH).read()
    pattern = re.compile(
        r"(_PRIORITY = \[\n).*?(    # --- index 50 boundary)", re.S
    )
    body = "".join(f'    "{n}",\n' for n in window)
    new, n_sub = pattern.subn(rf"\g<1>{body}\g<2>", src)
    if n_sub != 1:
        raise SystemExit("_PRIORITY block not found; apply by hand")
    with open(INIT_PATH, "w") as fh:
        fh.write(new)
    print(f"rewrote {INIT_PATH} with a {len(window)}-query window")


def main() -> int:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    bad = flags - {"--apply", "--changed", "--changed-files"}
    if bad:
        raise SystemExit(f"unknown flags: {sorted(bad)}")
    pinned = [a for a in sys.argv[1:] if not a.startswith("--")]
    latest = graded_latest()
    if "--changed" in flags or "--changed-files" in flags:
        auto = (
            changed_pins_files()
            if "--changed-files" in flags
            else changed_pins()
        )
        n_ungraded_total = _n_ungraded()
        cap = max(0, WINDOW - len(pinned) - n_ungraded_total)
        deferred = auto[cap:]
        for name in deferred:
            print(f"DEFERRED (window full): {name}")
        pinned += [n for n in auto[:cap] if n not in pinned]
    window = next_window(pinned)
    n_ungraded_in = len([n for n in window if n not in latest])
    for name in window:
        tag = "" if name not in latest else f"  (re-verify, r{latest[name]})"
        print(f"{name}{tag}")
    print(
        f"\n{len(window)} queries; {n_ungraded_in} never-graded in window"
    )
    if "--apply" in flags:
        apply_window(window)
        # sanity: the rewritten module must import and still expose
        # the window as its first entries
        import importlib

        import aws_lakehouse_spark.plans as plans

        importlib.reload(plans)
        got = list(plans.REGISTRY)[: len(window)]
        assert got == window, "reorder mismatch after apply"
        print("re-import check: window confirmed as the first entries")
    return 0


def _n_ungraded() -> int:
    from aws_lakehouse_spark.plans import REGISTRY

    latest = graded_latest()
    return sum(
        1
        for n, s in REGISTRY.items()
        if s.oracle is not None and n not in latest
    )


if __name__ == "__main__":
    sys.exit(main())
