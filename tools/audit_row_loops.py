"""Interior-pandas-row-loop auditor (r5 verdict task 7).

Python row loops inside applyInPandas / mapInPandas bodies are the
slow path squared: per-row interpreter work on the executor, invisible
to whole-stage codegen and to the plan auditor (the plan just shows
one Arrow eval node). This sweep finds every `for ... in pdf[...]`,
`zip(pdf[...])`, `.iterrows()` and `.itertuples()` in the package and
FAILS unless a `# row-loop-ok:` justification comment sits within the
5 preceding lines — so a hot row loop can't land silently; it either
gets vectorized or gets a reviewed reason (bounded group, per-row
format dispatch, inherently sequential greedy, ...).

The cusum scan — the one loop the r5 bench flagged hot — was removed
by the prefix-sum/running-min window rewrite; the remaining marked
sites are bounded or structurally per-row (see each marker).
"""

from __future__ import annotations

import os
import re
import sys

PATTERNS = re.compile(
    r"(for\s+.+\s+in\s+(pdf|df_pdf|batch)\[|"
    r"zip\(\s*pdf\[|\.iterrows\(\)|\.itertuples\()"
)
MARKER = "row-loop-ok:"
LOOKBACK = 5


def main() -> None:
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pipeline_query_engine_demo_spark",
    )
    violations = []
    marked = 0
    for dirpath, _dirs, files in os.walk(root):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as f:
                lines = f.readlines()
            for i, line in enumerate(lines):
                if line.lstrip().startswith("#") or not PATTERNS.search(line):
                    continue
                window = lines[max(0, i - LOOKBACK) : i + 1]
                if any(MARKER in w for w in window):
                    marked += 1
                else:
                    rel = os.path.relpath(path, os.path.dirname(root))
                    violations.append(f"{rel}:{i + 1}: {line.strip()[:90]}")
    print(f"{marked} justified row loops; {len(violations)} unmarked")
    for v in violations:
        print("VIOLATION:", v)
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
