"""Citation hygiene audit: every reference-repo file path cited in this
repo's sources (docstrings/comments like ``src/scrapper/main.go:64``)
must actually exist under /root/reference, and any cited line number must
be within the file.  Exit 0 = zero dangling citations.

Usage: python tools/audit_citations.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent

# e.g. src/client/main.go:145-203, src/queue/main.go:51, docs/design.md,
# internal/gather/gather.go:12 — any repo-relative path with a known
# reference extension, optionally followed by :line or :line-line
CITE = re.compile(
    r"\b((?:[A-Za-z0-9_.-]+/)+[A-Za-z0-9_.-]+\.(?:go|md|proto|yml|yaml|txt))"
    r"(?::(\d+)(?:-(\d+))?)?")

# paths that are OURS (repo-relative), not reference citations
OWN_PREFIXES = ("weaver_ray/", "tests/", "tools/", "jobs/", "BENCH/")


def main() -> int:
    bad: list[str] = []
    checked = 0
    me = Path(__file__).resolve()
    for py in sorted(REPO.rglob("*.py")):
        if ".git" in py.parts or py.resolve() == me:
            continue
        text = py.read_text(errors="replace")
        for m in CITE.finditer(text):
            rel, a, b = m.group(1), m.group(2), m.group(3)
            if (rel.startswith(OWN_PREFIXES) or (REPO / rel).exists()
                    or Path("/" + rel).exists()):
                continue
            target = REF / rel
            checked += 1
            where = f"{py.relative_to(REPO)}: cites {m.group(0)}"
            if not target.exists():
                bad.append(f"{where} — {target} does not exist")
                continue
            if a is not None:
                n_lines = sum(1 for _ in target.open(errors="replace"))
                last = int(b or a)
                if last > n_lines:
                    bad.append(
                        f"{where} — line {last} > {n_lines} lines in file")
    print(f"audit_citations: {checked} reference citations checked, "
          f"{len(bad)} dangling")
    for x in bad:
        print("  DANGLING", x)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
