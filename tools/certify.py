"""Round-end certification in one command.

Runs the three driver-facing gates in sequence and prints ONE JSON line
suitable for PROGRESS.jsonl:

  1. driver-contract simulation — vanilla SparkSession imports
     ``__spark_entry__``; entry() rows, queries()/oracle_sql() parity,
     and the first-50 grading window are checked;
  2. grade-freshness gate — every query changed since the round boundary
     must be windowed or carry a fresh SCALE_SWEEP.json row (PARITY.md);
  3. full oracle sweep — every queries() entry vs its DuckDB oracle at
     sf0.01 (tools/check_oracle.py in a subprocess);
  3. pytest — the whole tests/ suite (skippable with --no-pytest for a
     mid-session sweep);
  4. bench — bench.py at sf0.1 with anchors (skippable with --no-bench).

The contract sim also audits the graded window (first 50 queries) — or
all queries with --vanilla-all — for run-and-nonzero-rows under the
vanilla session from a non-repo cwd, the two conditions that caught the
r5 connector-pickle and vacuity bugs.

Usage: python tools/certify.py [--no-pytest] [--no-bench] [--vanilla-all] [sf_dir]
Exit 0 only if every gate ran green.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _driver_contract(sf_dir: str, audit_all: bool) -> dict:
    """Vanilla-session sim run from a NON-repo cwd — the two conditions
    that caught the r5 connector-pickle and vacuity bugs: the driver's
    session has none of our confs, and its cwd puts nothing of ours on
    helper processes' sys.path.  Every audited query must run AND return
    rows (0 rows at the grade scale = a vacuous green in the hash
    compare)."""
    code = """
import sys, json
sys.path.insert(0, %r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
rows = len(e.entry(spark).collect())
qs, osql = e.queries(), e.oracle_sql()
win = list(qs)[:50]
audit = list(qs) if %r else win
bad = []
for name in audit:
    try:
        if qs[name](spark, %r).count() == 0:
            bad.append([name, "0 rows (vacuous)"])
    except Exception as ex:
        bad.append([name, type(ex).__name__ + ": " + str(ex)[:200]])
print("CERTIFY " + json.dumps({
    "entry_rows": rows,
    "n_queries": len(qs),
    "n_oracles": len(osql),
    "oracle_orphans": [k for k in osql if k not in qs],
    "window_first": win[0], "window_last": win[-1],
    "vanilla_audited": len(audit),
    "vanilla_problems": bad,
}))
""" % (REPO, audit_all, sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, cwd="/tmp",
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("CERTIFY "):
            d = json.loads(line[len("CERTIFY "):])
            d["ok"] = (
                d["entry_rows"] > 0
                and not d["oracle_orphans"]
                and not d["vanilla_problems"]
            )
            return d
    return {"ok": False, "error": (out.stderr or out.stdout)[-500:]}


def query_module_deps(repo: str | None = None) -> dict:
    """Map every ``qNN_`` query in ``queries.py`` to the repo-relative
    ``apache_arrow_spark`` module files it reaches, TRANSITIVELY (r9
    verdict #2 — certify's changed-query detection used to stop at
    queries.py, leaving library-file edits an honor-system hole).

    One AST pass, no imports executed:

    1. every library file is parsed and its intra-package imports
       (absolute ``apache_arrow_spark.*`` and relative ``from .x``)
       become file→file edges; a package module resolves to its
       ``__init__.py`` so re-exports close transitively;
    2. each top-level function in queries.py collects its function-local
       library imports plus any module-level-imported names it uses;
    3. helper calls (``_q159_layout_live`` etc.) union deps to a
       fixpoint, then every direct dep expands through the library
       closure.

    Unresolvable modules map to the package ``__init__.py`` (fail
    closed: a diff there invalidates broadly rather than narrowly)."""
    import ast
    import re

    repo = repo or REPO
    pkg_root = os.path.join(repo, "apache_arrow_spark")

    def resolve(mod: str, extra_name: str | None = None) -> set:
        """Dotted module -> repo-relative file path(s)."""
        out = set()
        for cand in ([f"{mod}.{extra_name}"] if extra_name else []) + [mod]:
            rel = cand.replace(".", "/")
            if os.path.isfile(os.path.join(repo, rel + ".py")):
                out.add(rel + ".py")
                return out
            if os.path.isdir(os.path.join(repo, rel)):
                out.add(rel + "/__init__.py")
                return out
        return {"apache_arrow_spark/__init__.py"}  # fail closed

    # ---- library file -> direct intra-package deps -----------------------
    lib_edges: dict = {}
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, repo)
            pkg = os.path.relpath(dirpath, repo).replace("/", ".")
            deps: set = set()
            try:
                node = ast.parse(open(path).read())
            except SyntaxError:
                lib_edges[rel] = deps
                continue
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom):
                    if sub.level:  # relative import
                        base = pkg.rsplit(".", sub.level - 1)[0] if sub.level > 1 else pkg
                        mod = f"{base}.{sub.module}" if sub.module else base
                        for a in sub.names:
                            deps |= resolve(mod, a.name)
                    elif sub.module and sub.module.startswith("apache_arrow_spark"):
                        for a in sub.names:
                            deps |= resolve(sub.module, a.name)
                elif isinstance(sub, ast.Import):
                    for a in sub.names:
                        if a.name.startswith("apache_arrow_spark"):
                            deps |= resolve(a.name)
            lib_edges[rel] = deps

    def closure(start: set) -> set:
        seen, work = set(start), list(start)
        while work:
            f = work.pop()
            for d in lib_edges.get(f, ()):
                if d not in seen:
                    seen.add(d)
                    work.append(d)
        return seen

    # ---- queries.py: per-function direct deps + helper-call fixpoint -----
    qtree = ast.parse(open(os.path.join(pkg_root, "queries.py")).read())
    global_name_deps: dict = {}  # module-level imported name -> files
    for node in qtree.body:
        if isinstance(node, ast.ImportFrom) and node.module and \
                node.module.startswith("apache_arrow_spark"):
            for a in node.names:
                global_name_deps[a.asname or a.name] = resolve(node.module, a.name)
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("apache_arrow_spark"):
                    global_name_deps[(a.asname or a.name).split(".")[0]] = resolve(a.name)

    funcs = {
        n.name: n for n in qtree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    direct: dict = {}
    calls: dict = {}
    for name, node in funcs.items():
        deps, used = set(), set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom) and sub.module and \
                    sub.module.startswith("apache_arrow_spark"):
                for a in sub.names:
                    deps |= resolve(sub.module, a.name)
            elif isinstance(sub, ast.Import):
                for a in sub.names:
                    if a.name.startswith("apache_arrow_spark"):
                        deps |= resolve(a.name)
            elif isinstance(sub, ast.Name):
                used.add(sub.id)
        for nm in used & set(global_name_deps):
            deps |= global_name_deps[nm]
        direct[name] = deps
        calls[name] = used & set(funcs) - {name}
    changed = True
    while changed:  # helper-call fixpoint (helpers may call helpers)
        changed = False
        for name in funcs:
            for callee in calls[name]:
                if not direct[callee] <= direct[name]:
                    direct[name] |= direct[callee]
                    changed = True
    return {
        name: sorted(closure(deps))
        for name, deps in direct.items()
        if re.match(r"q\d{2,}_", name)
    }


def row_certifies(
    name: str,
    row: dict,
    boundary_ts: float,
    repo: str | None = None,
    rel_path: str = "apache_arrow_spark/queries.py",
    deps: list | None = None,
) -> bool:
    """A sweep row certifies its query iff it is green, newer than the
    round boundary, AND (self-certifying ledger, r8 verdict #5) the
    query's implementation has not changed between the tree the row ran
    on (its ``sha`` stamp) and the CURRENT working tree — where "the
    query's implementation" includes every library module the query
    reaches (``deps``, from :func:`query_module_deps`; r9 verdict #2):
    a queries.py diff must not name the query, and the reached library
    files must have NO diff at all (coarse on purpose — fail closed).
    Rows without a sha (pre-r9 ledger) keep the timestamp-only gate; a
    sha git can't resolve fails closed — re-sweep, never trust."""
    import re

    if row.get("verdict") not in ("full", "slice"):
        return False
    if row.get("at", 0) <= boundary_ts:
        return False
    sha = row.get("sha")
    if not sha:
        return True  # legacy row: timestamp gate only
    if sha == "unknown":
        return False
    base = sha.removesuffix("-dirty")
    # base..working-tree diff (committed AND uncommitted edits) — a
    # dirty-stamped row is checked against the same diff: if the dirty
    # edits were committed unchanged the diff is empty; if anything
    # about the query moved, it re-sweeps (fail closed)
    proc = subprocess.run(
        ["git", "diff", "--unified=0", base, "--", rel_path],
        capture_output=True, text=True, cwd=repo or REPO,
    )
    if proc.returncode != 0:
        return False  # unresolvable sha
    if name in set(re.findall(r"\bq\d{2,}_[a-z0-9_]+", proc.stdout)):
        return False
    lib = [d for d in (deps or []) if d != rel_path]
    if lib:
        proc = subprocess.run(
            ["git", "diff", "--name-only", base, "--", *lib],
            capture_output=True, text=True, cwd=repo or REPO,
        )
        if proc.returncode != 0 or proc.stdout.strip():
            return False  # a reached library file changed (or bad sha)
    return True


def _freshness() -> dict:
    """Grade-freshness gate (PARITY.md convention, r7 verdict #7): every
    query whose implementation changed since the round boundary (the
    driver's last ``round N:`` commit) must either sit inside the graded
    window (first 50 of queries()) or carry a SCALE_SWEEP.json row newer
    than the boundary.  Detection is two-pronged (r9 verdict #2 closed
    the library-file hole): the queries.py diff names queries directly
    (hunk headers name the enclosing ``def qNNN_``, changed lines catch
    ``@register`` edits), and a diff in any OTHER ``apache_arrow_spark``
    file marks every query whose transitive module closure
    (:func:`query_module_deps`) reaches it."""
    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", *args], capture_output=True, text=True, cwd=REPO
        ).stdout

    boundary = _git("log", "--grep", "^round [0-9]*:", "-1", "--format=%H").strip()
    if not boundary:
        return {"ok": True, "note": "no round-boundary commit found"}
    boundary_ts = float(_git("show", "-s", "--format=%ct", boundary).strip() or 0)
    diff = _git("diff", "--unified=0", f"{boundary}..HEAD", "--",
                "apache_arrow_spark/queries.py")
    import re

    changed = set()
    for line in diff.splitlines():
        if line.startswith("@@") or line[:1] in "+-":
            changed.update(re.findall(r"\bq\d{2,}_[a-z0-9_]+", line))
    # library-file prong: any changed apache_arrow_spark module marks
    # every query that (transitively) imports it
    deps = query_module_deps()
    lib_changed = {
        f for f in _git("diff", "--name-only", f"{boundary}..HEAD", "--",
                        "apache_arrow_spark").splitlines()
        if f.strip() and f != "apache_arrow_spark/queries.py"
    }
    via_lib = sorted(
        n for n, files in deps.items() if lib_changed & set(files)
    ) if lib_changed else []
    changed |= set(via_lib)
    # restrict to real registry names and resolve the window
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __spark_entry__ as e\n"
        "qs = list(e.queries())\n"
        "import json; print('NAMES ' + json.dumps([qs, qs[:50]]))" % REPO
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, cwd="/tmp")
    names = window = []
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("NAMES "):
            names, window = json.loads(line[len("NAMES "):])
            break
    changed &= set(names)
    sweep_rows: dict = {}
    ledger = os.path.join(REPO, "SCALE_SWEEP.json")
    if os.path.exists(ledger):
        with open(ledger) as f:
            sweep_rows = json.load(f)

    stale = sorted(
        n for n in changed
        if n not in window
        and not row_certifies(n, sweep_rows.get(n, {}), boundary_ts,
                              deps=deps.get(n))
    )
    return {
        "ok": not stale,
        "boundary": boundary[:10],
        "changed_queries": sorted(changed),
        "changed_via_library": via_lib,
        "stale_unwindowed": stale,
    }


def _sweep(sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), sf_dir],
        capture_output=True, text=True, timeout=7200, cwd=REPO,
    )
    tail = [l for l in out.stdout.splitlines() if " pass, " in l]
    summary = tail[-1].strip() if tail else ""
    fails = [l.strip() for l in out.stdout.splitlines() if l.strip().startswith("✗")]
    return {
        "ok": out.returncode == 0 and bool(summary),
        "summary": summary,
        "failures": fails[:20],
    }


def _pytest() -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
        capture_output=True, text=True, timeout=7200, cwd=REPO,
    )
    tail = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    return {"ok": out.returncode == 0, "summary": tail}


def _bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            d = json.loads(line)
            return {
                "ok": out.returncode == 0,
                "headline_sec": d.get("value"),
                "n_queries": len(d.get("queries", {})),
                "anchors": d.get("baseline_anchors"),
            }
    return {"ok": False, "error": (out.stderr or out.stdout)[-500:]}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    t0 = time.time()
    result: dict = {"ts": None, "kind": "certify"}

    result["contract"] = _driver_contract(sf_dir, "--vanilla-all" in sys.argv)
    result["freshness"] = _freshness()
    result["sweep"] = _sweep(sf_dir)
    if "--no-pytest" not in sys.argv:
        result["pytest"] = _pytest()
    if "--no-bench" not in sys.argv:
        result["bench"] = _bench()

    result["wall_s"] = round(time.time() - t0, 1)
    result["ok"] = all(
        v.get("ok") for k, v in result.items() if isinstance(v, dict)
    )
    result["ts"] = time.time()
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
