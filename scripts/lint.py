#!/usr/bin/env python
"""Static checks for the repo (CodeQL-analog within the sandbox: no
third-party linters are installable, so this is self-contained).

1. Python: compile every source file, then AST-check for unused
   imports, duplicate function/class definitions in a scope, and
   ``except:`` bare handlers.
2. C++: compile the native runtime with -Wall -Wextra -Wshadow -Werror,
   then run GCC's symbolic-execution static analyzer (-fanalyzer) over
   it — the deep-analysis analog of the reference's CodeQL job
   (reference .github/workflows/codeql.yml) for a parser of untrusted
   bitstreams. CI additionally runs clang-tidy (bugprone-*, cert-*,
   clang-analyzer-*; see .clang-tidy), which isn't installable here.

Exit code 0 = clean. Run by the CI lint job and locally via
``python scripts/lint.py``.
"""

import ast
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PY_DIRS = ["lac_tpu", "tests", "scripts"]
PY_FILES = [ROOT / "bench.py", ROOT / "__graft_entry__.py"]
CPP = ROOT / "lac_tpu" / "runtime" / "src" / "lac_runtime.cpp"


def py_sources():
    for d in PY_DIRS:
        yield from sorted((ROOT / d).rglob("*.py"))
    yield from PY_FILES


class ImportUseChecker(ast.NodeVisitor):
    def __init__(self):
        self.imported = {}  # name -> (lineno, original)
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imported[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imported[name] = (node.lineno, a.name)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path):
    problems = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    # unused imports (module scope and function scope alike);
    # package __init__.py files re-export by design
    noqa_lines = {
        i + 1 for i, line in enumerate(src.splitlines()) if "noqa" in line
    }
    if path.name != "__init__.py":
        checker = ImportUseChecker()
        checker.visit(tree)
        for name, (lineno, orig) in checker.imported.items():
            if name not in checker.used and lineno not in noqa_lines:
                problems.append(f"{path}:{lineno}: unused import '{orig}'")

    for node in ast.walk(tree):
        # bare except
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")
        # duplicate defs in one scope
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef)):
            seen = {}
            for child in ast.iter_child_nodes(node):
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    if child.name in seen and child.lineno not in noqa_lines:
                        problems.append(
                            f"{path}:{child.lineno}: duplicate definition "
                            f"'{child.name}' (first at line {seen[child.name]})"
                        )
                    seen.setdefault(child.name, child.lineno)
    return problems


def main():
    problems = []
    for path in py_sources():
        problems.extend(check_file(path))

    cpp = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-fsyntax-only",
         "-Wall", "-Wextra", "-Wshadow", "-Werror", str(CPP)],
        capture_output=True, text=True,
    )
    if cpp.returncode != 0:
        problems.append(f"native runtime -Wall -Wextra -Werror failed:\n{cpp.stderr}")

    # -fanalyzer needs real code generation (it runs on GIMPLE, not
    # syntax); -O1 keeps the interprocedural exploration tractable
    ana = subprocess.run(
        ["g++", "-fanalyzer", "-O1", "-std=c++17", "-fPIC", "-Werror",
         "-c", str(CPP), "-o", "/dev/null"],
        capture_output=True, text=True,
    )
    if ana.returncode != 0:
        problems.append(f"native runtime -fanalyzer failed:\n{ana.stderr[-4000:]}")

    for p in problems:
        print(p)
    print(f"lint: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
