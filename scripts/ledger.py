"""Per-query evidence ledger (VERDICT r10 #1).

rotation.py's staleness test was FILE-granular: a query counted stale
whenever its defining module had ANY git commit newer than its last
banked driver row.  The operator modules are big (dedup.py ~1.8k LoC
backing ~25 queries), so a one-line docstring touch re-staled every
sibling query and the re-bank tail could mathematically never drain at
~40 window slots/round (137/216 "stale" at r10 close, almost all of it
evidence lag rather than code change).

This module makes staleness PER-QUERY.  Each query's identity is

    sha256( source(queries()[name])
          + sources of its transitive in-package helper functions /
            classes (resolved statically via co_names/co_consts)
          + reprs of module-level scalar constants it references
          + "\\x00" + oracle_sql()[name] )

The ledger (scripts/query_ledger.json) maps query name -> the hash of
the code THE DRIVER ACTUALLY VERIFIED, extracted from the git tree of
the CORRECTNESS_r{N}.json artifact commit (the driver commits each
round's artifacts on top of that round's final code, so that tree IS
the verified code).  rotation.py then flags a query stale only when
its CURRENT hash differs from the ledger hash — sibling-op and
comment-only module churn no longer invalidates banked evidence, while
any change to the callable, a helper it reaches, a constant it reads,
or its oracle text still does.

Limits (why the module-mtime rule stays as a fallback in rotation.py):
helpers reached only through dynamic dispatch / getattr / SQL-string
builders passed by name are invisible to the static walk, and queries
missing from the ledger (never synced, or absent at the banked commit)
keep the old file-granular rule.  `--must` in rotation.py remains the
manual override for material rewrites the walk can't see.

Commands
--------
    python scripts/ledger.py hash          # print {name: hash} for the
                                           # tree this file sits in
                                           # (used inside worktrees)
    python scripts/ledger.py sync          # bring query_ledger.json up
                                           # to date from every
                                           # committed CORRECTNESS
                                           # artifact (idempotent; run
                                           # at round start, right
                                           # after the driver's
                                           # artifact commit)

`sync` groups queries by the artifact commit of their latest banked
round, materializes each commit once via `git worktree add --detach`,
copies THIS file in (old trees predate it), and runs `hash` there —
so old and new trees are hashed by identical logic.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import inspect
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import textwrap
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO, "scripts", "query_ledger.json")
PACKAGE = "mapreduceinfrastructure_spark"

# Bump whenever the hashing logic changes: sync() recomputes any ledger
# entry recorded under a different version (old worktrees are hashed by
# THIS file — sync copies it in — so versions never mix within a run).
HASH_VERSION = 2


def _normalize_source(src: str) -> str:
    """Semantic-ish source identity (r12): parse and unparse the code so
    comments, docstrings, blank lines and formatting drop out of the
    hash.  Before this, a docstring-only touch to a helper re-staled
    every query reaching it — the same treadmill the ledger was built
    to kill, one granularity level down (VERDICT r10 #1 / r11 #2: the
    stale tier kept refilling with evidence lag, not code change).
    Any parse failure falls back to the raw text (never hide a change
    behind a normalizer bug)."""
    try:
        tree = ast.parse(textwrap.dedent(src))
        for node in ast.walk(tree):
            body = getattr(node, "body", None)
            if (
                isinstance(
                    node,
                    (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
                )
                and body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                # drop the docstring; keep an empty body valid
                node.body = body[1:] or [ast.Pass()]
        return ast.unparse(tree)
    except (SyntaxError, ValueError):
        return src

# ---------------------------------------------------------------------------
# hashing


def _is_in_package(obj) -> bool:
    mod = getattr(obj, "__module__", "") or ""
    return mod == "__spark_entry__" or mod.split(".")[0] == PACKAGE


def _collect_sources(fn, out: dict[str, str], seen: set) -> None:
    """Walk fn's code object for in-package helpers and constants.

    Static + best-effort: resolves co_names / nested code objects'
    co_names against fn.__globals__; functions and classes defined in
    this package recurse, module-level scalar constants contribute
    their repr.  Modules themselves are skipped (including a whole
    module's source would re-create file granularity)."""
    fn = inspect.unwrap(fn)
    code = getattr(fn, "__code__", None)
    if code is None or id(code) in seen:
        return
    seen.add(id(code))
    key = f"{fn.__module__}.{getattr(fn, '__qualname__', fn.__name__)}"
    if key not in out:
        try:
            out[key] = _normalize_source(inspect.getsource(fn))
        except (OSError, TypeError):
            out[key] = repr(fn)

    g = getattr(fn, "__globals__", {})

    def walk_code(co) -> None:
        names = set(co.co_names)
        for const in co.co_consts:
            if isinstance(const, types.CodeType):
                names.update(const.co_names)
                walk_code(const)
        for name in sorted(names):
            if name not in g:
                continue
            obj = g[name]
            if isinstance(obj, types.ModuleType):
                continue
            if inspect.isfunction(obj) and _is_in_package(obj):
                _collect_sources(obj, out, seen)
            elif inspect.isclass(obj) and _is_in_package(obj):
                ckey = f"{obj.__module__}.{obj.__qualname__}"
                if ckey not in out:
                    try:
                        out[ckey] = _normalize_source(inspect.getsource(obj))
                    except (OSError, TypeError):
                        out[ckey] = repr(obj)
            elif isinstance(obj, (int, float, str, bool, bytes, tuple, frozenset)):
                out.setdefault(f"const:{fn.__module__}.{name}", repr(obj))

    walk_code(code)

    # FUNCTION-LOCAL relative imports (r11): `from .dedup import
    # ppjoin_pairs_raw` inside a body binds a LOCAL name — invisible
    # to the co_names/__globals__ resolution above, which is exactly
    # how pagerank_docs' dependence on the r11 _prefix_frames rework
    # escaped the hash (caught when rotation.py skipped a --must
    # entry).  Resolve them from the source text instead.
    src = out.get(key, "")
    for m in re.finditer(
        r"^\s*from\s+(\.[\w.]*|mapreduceinfrastructure_spark[\w.]*)\s+"
        r"import\s+([\w\s,()]+)",
        src,
        re.MULTILINE,
    ):
        # Both RELATIVE and ABSOLUTE in-package from-imports (ADVICE
        # r11: the relative-only regex let an absolute in-package
        # import inside a function body escape the identity hash —
        # the exact failure mode this resolution exists to close).
        relmod, names = m.group(1), m.group(2)
        try:
            import importlib

            if relmod.startswith("."):
                mod = importlib.import_module(
                    relmod, package=fn.__module__.rsplit(".", 1)[0]
                )
            else:
                mod = importlib.import_module(relmod)
        except Exception:
            continue
        for nm in re.split(r"[,\s()]+", names):
            obj = getattr(mod, nm, None) if nm else None
            if obj is None:
                continue
            if inspect.isfunction(obj) and _is_in_package(obj):
                _collect_sources(obj, out, seen)
            elif isinstance(obj, (int, float, str, bool, bytes, tuple, frozenset)):
                out.setdefault(f"const:{mod.__name__}.{nm}", repr(obj))


def query_hash(fn, oracle: str) -> str:
    parts: dict[str, str] = {}
    _collect_sources(fn, parts, set())
    h = hashlib.sha256()
    for key in sorted(parts):
        h.update(key.encode())
        h.update(b"\x01")
        h.update(parts[key].encode())
        h.update(b"\x02")
    h.update(b"\x00")
    h.update(oracle.encode())
    return h.hexdigest()


def compute_hashes(repo: str = REPO) -> dict[str, str]:
    """{query name: hash} for every oracle-backed query in `repo`."""
    sys.path.insert(0, repo)
    try:
        import __spark_entry__ as e

        qs, oracles = e.queries(), e.oracle_sql()
        return {
            n: query_hash(fn, oracles[n])
            for n, fn in qs.items()
            if n in oracles
        }
    finally:
        sys.path.remove(repo)


# ---------------------------------------------------------------------------
# ledger sync


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _artifact_commit(round_no: int) -> str:
    """Commit sha whose tree the round's driver rows verified ('' if
    the artifact exists but is not yet committed)."""
    return _git(
        "log", "-1", "--format=%H", "--",
        f"CORRECTNESS_r{round_no:02d}.json",
    )


def banked_history() -> dict[str, list[int]]:
    """query -> ALL rounds with a fully-passing driver row, newest
    first (same row schema pin as rotation.banked_rounds)."""
    hist: dict[str, set[int]] = {}
    required = {"rows_match", "schema_match", "hash_match", "err"}
    for fn in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(os.path.join(REPO, fn)))
        for name, row in data.items():
            missing = required - set(row)
            assert not missing, f"{fn}[{name}]: missing keys {missing}"
            if (
                row["rows_match"] and row["schema_match"]
                and row["hash_match"] and not row["err"]
            ):
                hist.setdefault(name, set()).add(rnd)
    return {n: sorted(rs, reverse=True) for n, rs in hist.items()}


def banked_rounds() -> dict[str, int]:
    """query -> latest round with a fully-passing driver row."""
    return {n: rs[0] for n, rs in banked_history().items()}


def _hashes_at_commit(sha: str) -> dict[str, str]:
    """Run `ledger.py hash` inside a throwaway worktree of `sha`."""
    head = _git("rev-parse", "HEAD")
    if sha == head:
        return compute_hashes(REPO)
    tmp = tempfile.mkdtemp(prefix="ledger_wt_")
    try:
        # tempfile.mkdtemp created the dir; worktree add wants to make it
        os.rmdir(tmp)
        _git("worktree", "add", "--detach", tmp, sha)
        os.makedirs(os.path.join(tmp, "scripts"), exist_ok=True)
        shutil.copy(
            os.path.abspath(__file__),
            os.path.join(tmp, "scripts", "ledger.py"),
        )
        out = subprocess.run(
            [sys.executable, os.path.join("scripts", "ledger.py"), "hash"],
            cwd=tmp, capture_output=True, text=True,
        )
        if out.returncode != 0:
            sys.stderr.write(
                f"[ledger] hash at {sha[:10]} failed:\n{out.stderr[-2000:]}\n"
            )
            return {}
        return json.loads(out.stdout)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        subprocess.run(
            ["git", "worktree", "prune"], cwd=REPO, capture_output=True
        )


def load_ledger() -> dict[str, dict]:
    if os.path.exists(LEDGER_PATH):
        return json.load(open(LEDGER_PATH))
    return {}


def sync() -> None:
    ledger = load_ledger()
    history = banked_history()
    # for each query, the NEWEST banked round whose artifact is
    # committed — walking down the query's own banked history (ADVICE
    # r11: the old loop never decremented, so a query whose latest
    # artifact was uncommitted silently kept a stale/missing entry).
    # An all-uncommitted history keeps the older ledger entry / the
    # mtime fallback until the driver's artifact commit lands.
    commit_of: dict[int, str] = {}
    todo: dict[str, tuple[int, str]] = {}
    for name, rounds in history.items():
        rnd, sha = 0, ""
        for r in rounds:  # newest first
            if r not in commit_of:
                commit_of[r] = _artifact_commit(r)
            if commit_of[r]:
                rnd, sha = r, commit_of[r]
                break
        if not sha:
            continue
        entry = ledger.get(name, {})
        if (
            entry.get("round", -1) >= rnd
            and entry.get("v", 1) == HASH_VERSION
        ):
            continue
        todo[name] = (rnd, sha)

    by_sha: dict[str, list[str]] = {}
    for name, (_, sha) in todo.items():
        by_sha.setdefault(sha, []).append(name)

    for sha, names in sorted(by_sha.items()):
        hashes = _hashes_at_commit(sha)
        got = 0
        for name in names:
            if name in hashes:
                ledger[name] = {
                    "hash": hashes[name],
                    "round": todo[name][0],
                    "commit": sha[:12],
                    "v": HASH_VERSION,
                }
                got += 1
        print(
            f"[ledger] {sha[:10]}: updated {got}/{len(names)} "
            f"({', '.join(sorted(names)[:6])}{'…' if len(names) > 6 else ''})"
        )

    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[ledger] wrote {len(ledger)} entries -> {LEDGER_PATH}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["hash", "sync"])
    args = ap.parse_args()
    if args.cmd == "hash":
        print(json.dumps(compute_hashes(REPO), indent=0, sort_keys=True))
    else:
        sync()


if __name__ == "__main__":
    main()
