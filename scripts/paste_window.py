"""Regenerate the driver window and paste it into both pinned copies.

Runs scripts/rotation.py, then rewrites:
  - __spark_entry__.py: the ``DRIVER_WINDOW_R{N} = [...]`` literal (renaming
    it to the new round) and ``WINDOW_ROUND = N``;
  - tests/test_oracle_parity.py: the mirrored ``DRIVER_WINDOW = [...]``.

The new round number is max(CORRECTNESS_r*.json)+1 — the same rule
tests/test_oracle_parity.py::test_window_round_is_fresh enforces.  Run this
at round start AND after the last operator commit of a round (operator
edits re-stale their queries, changing the rotation).

Usage: python scripts/paste_window.py
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _new_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json found")
    return max(rounds) + 1


def _rotation_literal() -> str:
    # extra CLI args (e.g. --must a,b) pass through to rotation.py
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "rotation.py"),
         *sys.argv[1:]],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(r"DRIVER_WINDOW = \[\n(.*?)\n\]", out, re.S)
    if not m:
        raise SystemExit(f"rotation.py output unparseable:\n{out[:2000]}")
    return m.group(1)


def _replace_block(text: str, head_re: str, new_head: str, body: str) -> str:
    """Replace `<head>\n<old body>\n]` where head matches head_re."""
    pat = re.compile(head_re + r"\n(?:.*?\n)?\]", re.S)
    if not pat.search(text):
        raise SystemExit(f"pattern not found: {head_re}")
    return pat.sub(new_head + "\n" + body + "\n]", text, count=1)


def main() -> None:
    rnd = _new_round()
    body = _rotation_literal()

    entry_path = os.path.join(REPO, "__spark_entry__.py")
    src = open(entry_path).read()
    src = re.sub(r"WINDOW_ROUND = \d+", f"WINDOW_ROUND = {rnd}", src)
    src = _replace_block(
        src, r"DRIVER_WINDOW_R\d+ = \[", f"DRIVER_WINDOW_R{rnd} = [", body)
    src = re.sub(r"DRIVER_WINDOW_R\d+", f"DRIVER_WINDOW_R{rnd}", src)
    open(entry_path, "w").write(src)

    test_path = os.path.join(REPO, "tests", "test_oracle_parity.py")
    tsrc = open(test_path).read()
    tsrc = _replace_block(tsrc, r"DRIVER_WINDOW = \[", "DRIVER_WINDOW = [", body)
    open(test_path, "w").write(tsrc)

    print(f"[paste_window] WINDOW_ROUND={rnd}; pasted 50-slot window into "
          f"__spark_entry__.py and tests/test_oracle_parity.py")


if __name__ == "__main__":
    main()
