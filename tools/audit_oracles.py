"""Mirrored-oracle audit (round-4 verdict item 6).

The correctness gate hash-compares each Spark builder against its DuckDB
oracle. That proof is only as strong as the INDEPENDENCE of the two
sides: a builder that runs ``spark.sql(S)`` with an oracle that is
essentially the same string S passes the gate tautologically — both
engines execute one author's expression, so a shared misunderstanding
cannot be caught. This audit locks in the round-4 practice ("every
SQL-mirrored query carries an independent semantic test"):

For every registered query whose BUILDER BODY contains a string literal
sharing a run of >= MIN_RUN normalized tokens with its rendered oracle
(decorator stripped first — the oracle literal itself lives in the
decorator), the query name must either appear in some file under
``tests/`` (an independent semantic check exists) or carry a
justification in MIRRORED_ORACLE_WHITELIST.

Runs without Spark (pure AST inspection), so it is also wired into
pytest (tests/test_plans.py) and fails CI on any unexcused mirror.

Usage: python tools/audit_oracles.py
"""

from __future__ import annotations

import ast
import inspect
import os
import re
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Minimum shared-token run (normalized identifiers/numbers) between a
#: builder string literal and the oracle before the pair counts as
#: mirrored. 12 tokens ~ a full SELECT item list or join condition —
#: long enough that shared table/column NAMES alone never trigger it.
MIN_RUN = 12

#: Mirrored queries explicitly argued to be acceptable without an
#: independent test. Keep EMPTY unless a justification genuinely holds;
#: prefer adding a test.
MIRRORED_ORACLE_WHITELIST: dict[str, str] = {}

_TOKEN = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|[0-9]+(?:\.[0-9]+)?")


def _tokens(s: str) -> list[str]:
    return [t.lower() for t in _TOKEN.findall(s)]


def _body_literals(fn) -> list[str]:
    """String literals in the function BODY (decorators stripped — the
    oracle string itself is a decorator argument)."""
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError):
        return []
    tree = ast.parse(src)
    fdef = next(
        (n for n in ast.walk(tree) if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))),
        None,
    )
    if fdef is None:
        return []
    lits: list[str] = []
    for stmt in fdef.body:
        for node in ast.walk(stmt):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                lits.append(node.value)
    # drop the docstring — prose can quote the oracle legitimately
    if (
        fdef.body
        and isinstance(fdef.body[0], ast.Expr)
        and isinstance(fdef.body[0].value, ast.Constant)
        and isinstance(fdef.body[0].value.value, str)
        and lits
    ):
        lits = lits[1:]
    return lits


def _shares_long_run(literals: list[str], oracle: str) -> bool:
    otoks = _tokens(oracle)
    if len(otoks) < MIN_RUN:
        return False
    ngrams = {tuple(otoks[i : i + MIN_RUN]) for i in range(len(otoks) - MIN_RUN + 1)}
    for lit in literals:
        ltoks = _tokens(lit)
        for i in range(len(ltoks) - MIN_RUN + 1):
            if tuple(ltoks[i : i + MIN_RUN]) in ngrams:
                return True
    return False


def _tested_names(tests_dir: str) -> set[str]:
    """Whole-token identifiers/strings used INSIDE test function bodies.

    ADVICE r5: the old raw-substring scan over concatenated test text
    let a query whose name is a substring of another tested query's
    name — or that appears only in a comment/docstring — pass without
    any real test. Parse each test module instead and collect, per
    `def test_*` body (docstring excluded): every ast.Name /
    ast.Attribute identifier and every whole \\w+ token inside string
    constants (queries are often addressed by name-string, e.g.
    `run("near_dup_pairs")`)."""
    import ast
    import re

    tokens: set[str] = set()
    for fname in sorted(os.listdir(tests_dir)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(tests_dir, fname)) as f:
            try:
                tree = ast.parse(f.read())
            except SyntaxError:
                continue
        for node in ast.walk(tree):
            if not isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ) or not node.name.startswith("test"):
                continue
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body = body[1:]  # docstring doesn't count as coverage
            for stmt in body:
                for sub in ast.walk(stmt):
                    if isinstance(sub, ast.Name):
                        tokens.add(sub.id)
                    elif isinstance(sub, ast.Attribute):
                        tokens.add(sub.attr)
                    elif isinstance(sub, ast.Constant) and isinstance(
                        sub.value, str
                    ):
                        tokens.update(re.findall(r"\w+", sub.value))
                    elif isinstance(sub, (ast.Import, ast.ImportFrom)):
                        for alias in sub.names:
                            tokens.add(alias.asname or alias.name)
    return tokens


def find_violations() -> tuple[list[str], list[str]]:
    """Returns (mirrored_query_names, violations)."""
    from pipeline_query_engine_demo_spark.plans.registry import REGISTRY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = _tested_names(os.path.join(root, "tests"))
    mirrored: list[str] = []
    violations: list[str] = []
    for name, spec in sorted(REGISTRY.items()):
        if not spec.oracle:
            continue
        if not _shares_long_run(_body_literals(spec.build), spec.oracle):
            continue
        mirrored.append(name)
        if name in MIRRORED_ORACLE_WHITELIST:
            continue
        if name not in corpus:
            violations.append(
                f"{name}: builder literal shares a >={MIN_RUN}-token run with its "
                "oracle (gate is tautological) and no tests/ file mentions the "
                "query — add an independent semantic test or whitelist with "
                "justification"
            )
    return mirrored, violations


def main() -> None:
    mirrored, violations = find_violations()
    print(
        f"{len(mirrored)} mirrored-oracle queries detected; "
        f"{len(violations)} without an independent test"
    )
    for name in mirrored:
        print("  mirrored:", name)
    for v in violations:
        print("VIOLATION:", v)
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
