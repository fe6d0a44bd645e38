"""Propose the next round's 50-slot driver window (VERDICT r6 #7).

Once every oracle-backed query has banked an external driver row
(complete after the r7 window), the window's job changes from coverage
to REGRESSION: re-verify the queries whose implementation changed most
recently, so the external driver gates exactly the code each round
touched.  This script emits the proposed ordered 50-list from:

1. the word_count / grep fidelity anchors (always slots 1-2);
2. every oracle-backed query whose defining module changed in git
   more recently than its last banked green driver row (these are the
   queries whose external evidence is STALE), newest change first;
3. the remaining oracle-backed queries, least-recently-banked first
   (round-robin re-verification of the untouched surface).

Change detection is PER-QUERY since r11 (VERDICT r10 #1): a query is
stale iff its identity hash (sha256 of the callable's source + its
transitive in-package helpers/constants + its oracle SQL — see
scripts/ledger.py) differs from the hash of the code its last banked
driver row actually verified (scripts/query_ledger.json, extracted
from the CORRECTNESS artifact commit's tree).  The former
file-granular rule (git mtime of the defining module vs the banked
row's commit) remains ONLY as a fallback for queries missing from the
ledger — under it, any docstring/sibling touch to a 1.5k-LoC operator
module re-staled ~25 queries at once and the re-bank tail could never
drain (137/216 "stale" at r10 close).  Banked rounds are read from
CORRECTNESS_r*.json (a row counts only if it passed).  Keep the
ledger synced: run `python scripts/ledger.py sync` at round start,
right after the driver's artifact commit.

Usage: python scripts/rotation.py [--window N] — prints the proposed
DRIVER_WINDOW list as a python literal to paste into
__spark_entry__.py, with a provenance comment per entry.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

ANCHORS = ["word_count", "grep"]


def _git_last_commit_ts(path: str) -> int:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", path],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    return int(out) if out else 0


def _git_commit_ts_of_round(round_no: int) -> int:
    """Timestamp of the evidence in CORRECTNESS_r{N}.json: the commit
    that recorded it, falling back to the FILE MTIME when the artifact
    is not yet committed (the driver writes each round's file before
    anything commits it — without the fallback an uncommitted round
    dated to 0 and every query it banked was misclassified stale,
    which is exactly the failure ADVICE r7 flagged on r07)."""
    path = f"CORRECTNESS_r{round_no:02d}.json"
    ts = _git_last_commit_ts(path)
    if ts == 0:
        try:
            ts = int(os.path.getmtime(os.path.join(REPO, path)))
        except OSError:
            ts = 0
    return ts


def banked_rounds() -> dict[str, int]:
    """query -> latest round with a passing driver row.

    Pinned to the ONE real CORRECTNESS row schema the driver writes
    ({name: {rows_match, schema_match, hash_match, spark_rows,
    oracle_rows, err}}) instead of the former match/ok/pass
    heuristic or-chain — an unrecognized file now fails loudly here
    rather than silently proposing a wrong window.
    """
    banked: dict[str, int] = {}
    required = {"rows_match", "schema_match", "hash_match", "err"}
    for fn in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(os.path.join(REPO, fn)))
        assert isinstance(data, dict), f"{fn}: expected a name->row dict"
        for name, row in data.items():
            missing = required - set(row)
            assert not missing, f"{fn}[{name}]: missing keys {missing}"
            ok = (
                row["rows_match"] and row["schema_match"]
                and row["hash_match"] and not row["err"]
            )
            if ok:
                banked[name] = max(banked.get(name, 0), rnd)
    return banked


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--must",
        default="",
        help=(
            "comma-separated queries whose implementation MATERIALLY "
            "changed this round — placed directly after the "
            "never-banked block regardless of stale ordering.  Module-"
            "granular change detection can't tell a material rewrite "
            "from a docstring touch, and in a round that touches many "
            "modules the tie-sort can push exactly the rewritten "
            "queries below the cut (ADVICE r9 on cluster_diameter)."
        ),
    )
    args = ap.parse_args()
    must = [s for s in args.must.split(",") if s]

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    candidates = [n for n in qs if n in oracles]
    banked = banked_rounds()

    entry_ts = _git_last_commit_ts("__spark_entry__.py")
    file_ts: dict[str, int] = {}

    def changed_ts(name: str) -> int:
        fn = qs[name]
        try:
            src = inspect.getsourcefile(inspect.unwrap(fn)) or ""
        except TypeError:
            src = ""
        rel = os.path.relpath(src, REPO) if src else "__spark_entry__.py"
        if rel not in file_ts:
            file_ts[rel] = _git_last_commit_ts(rel)
        # an oracle edit also invalidates evidence, but __spark_entry__
        # changes every round (registry churn) — use it only for
        # queries defined inline there (lambdas), not as a global max.
        return file_ts[rel] if not rel.startswith("..") else entry_ts

    banked_ts = {
        n: _git_commit_ts_of_round(r) for n, r in banked.items()
    }

    import ledger as led

    ledger_map = led.load_ledger()
    cur_hash = {n: led.query_hash(qs[n], oracles[n]) for n in candidates}

    def is_stale(n: str) -> bool:
        entry = ledger_map.get(n)
        if entry is not None:
            # per-query rule: stale iff the identity hash moved since
            # the code the banked row verified
            return cur_hash[n] != entry["hash"]
        # fallback (query never synced into the ledger): file-granular
        return changed_ts(n) > banked_ts.get(n, 0)

    # --must entries are FORCED into the re-verify set even when the
    # hash says clean (r11: the static walk missed a function-local
    # import and silently dropped a --must entry from the window —
    # the flag exists precisely for changes detection can't see)
    stale = [
        n for n in candidates
        if n not in ANCHORS and (is_stale(n) or n in must)
    ]
    # never-banked queries first (no external evidence AT ALL beats
    # stale evidence — without this, a new operator sharing a module
    # mtime with many stale siblings can tie-sort past the window cut);
    # then --must (materially changed this round); then OLDEST BANKED
    # EVIDENCE first (r10 policy change: in a round that touches most
    # modules, every stale entry carries the same change-ts and the
    # former newest-change-first sort degenerated to registry order,
    # repeatedly displacing the same old-evidence tail — exactly the
    # dedup family ADVICE r9 flagged).  change_ts DESC breaks bank-
    # round ties so the most recently touched of equally-old evidence
    # re-verifies first.
    stale.sort(
        key=lambda n: (
            n in banked,
            n in banked and n not in must,
            banked.get(n, 0),
            -changed_ts(n),
            n,
        )
    )
    fresh = [
        n for n in candidates if n not in ANCHORS and n not in stale
    ]
    fresh.sort(key=lambda n: (banked.get(n, 0), n))

    window = (ANCHORS + stale + fresh)[: args.window]
    print("DRIVER_WINDOW = [")
    for n in window:
        tag = (
            "anchor" if n in ANCHORS
            else "never banked"
            if n not in banked
            else (
                f"must: materially changed (last banked r{banked[n]})"
                if n in must
                else (
                    f"stale (hash changed since r{banked[n]} row)"
                    if n in ledger_map
                    else f"stale (module changed after r{banked[n]} row;"
                    " not in ledger)"
                )
            )
            if n in stale
            else f"backfill (last banked r{banked[n]})"
        )
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
