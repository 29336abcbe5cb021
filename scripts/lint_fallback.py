"""Minimal built-in linter for hermetic images without ruff.

Covers the highest-signal checks so `scripts/check.sh` still gates something
useful when ruff is unavailable: syntax errors, module-level unused imports
(F401), f-strings without placeholders (F541), and trailing whitespace (W291).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

TARGETS = ["deephall_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]


def iter_files() -> list[Path]:
    root = Path(__file__).resolve().parent.parent
    files = []
    for target in TARGETS:
        path = root / target
        if path.is_dir():
            files.extend(sorted(path.rglob("*.py")))
        elif path.exists():
            files.append(path)
    return files


def check_file(path: Path) -> list[str]:
    source = path.read_text()
    problems = []
    try:
        tree = ast.parse(source)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    # Format specs (":.4f") parse as nested JoinedStr nodes; exclude them from F541.
    format_specs = {
        id(node.format_spec)
        for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec is not None
    }
    imported: dict[str, tuple[int, ast.AST]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split(".")[0]
                imported[name] = (node.lineno, node)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                imported[alias.asname or alias.name] = (node.lineno, node)
        elif isinstance(node, ast.JoinedStr) and id(node) not in format_specs:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                problems.append(
                    f"{path}:{node.lineno}: F541 f-string without placeholders"
                )

    used = {
        node.id for node in ast.walk(tree) if isinstance(node, ast.Name)
    } | {
        node.value.id
        for node in ast.walk(tree)
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name)
    }
    # Names referenced inside string annotations / __all__ count as used.
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(node.value.replace(".", " ").split())
    for name, (lineno, _) in sorted(imported.items()):
        if name not in used and not name.startswith("_"):
            problems.append(f"{path}:{lineno}: F401 unused import '{name}'")

    for i, line in enumerate(source.splitlines(), 1):
        if line != line.rstrip():
            problems.append(f"{path}:{i}: W291 trailing whitespace")
    return problems


def main() -> int:
    all_problems = []
    for path in iter_files():
        all_problems.extend(check_file(path))
    for problem in all_problems:
        print(problem)
    print(f"lint_fallback: {len(all_problems)} problem(s)")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
