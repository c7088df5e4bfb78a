"""The self-certifying sweep-ledger gate (tools/certify.row_certifies).

A SCALE_SWEEP.json row must certify its query only when the query's
implementation is IDENTICAL between the tree the sweep ran on (the row's
``sha`` stamp) and the current working tree — verified here against a
scratch git repo so every accept/reject branch is exercised without
depending on this repo's own history.
"""

import os
import subprocess
import time

from tools.certify import row_certifies

_GIT_ENV = {
    **os.environ,
    "GIT_AUTHOR_NAME": "t",
    "GIT_AUTHOR_EMAIL": "t@t",
    "GIT_COMMITTER_NAME": "t",
    "GIT_COMMITTER_EMAIL": "t@t",
}


def _git(repo, *args):
    subprocess.run(
        ["git", *args], cwd=repo, check=True, capture_output=True, env=_GIT_ENV
    )


def _head(repo) -> str:
    return subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True, text=True
    ).stdout.strip()


def test_sweep_row_certifies_against_tree_sha(tmp_path):
    repo = str(tmp_path)
    _git(repo, "init", "-q")
    pkg = tmp_path / "apache_arrow_spark"
    pkg.mkdir()
    qfile = pkg / "queries.py"
    qfile.write_text("def q01_alpha():\n    return 1\n\ndef q02_beta():\n    return 2\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-q", "-m", "one")
    sha1 = _head(repo)
    # commit a change INSIDE q02's body (the hunk header, not the changed
    # line, is what names the query — the detection the gate relies on)
    qfile.write_text("def q01_alpha():\n    return 1\n\ndef q02_beta():\n    return 99\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-q", "-m", "two")
    sha2 = _head(repo)

    now = time.time()
    boundary = now - 3600

    def row(sha=None, verdict="full", at=now):
        r = {"verdict": verdict, "at": at}
        if sha is not None:
            r["sha"] = sha
        return r

    kw = dict(boundary_ts=boundary, repo=repo)
    # swept on the OLD tree, query changed since -> fail closed
    assert not row_certifies("q02_beta", row(sha1), **kw)
    # same old tree but q01 untouched since -> still certifies
    assert row_certifies("q01_alpha", row(sha1), **kw)
    # swept on the current tree -> certifies; dirty suffix resolves too
    assert row_certifies("q02_beta", row(sha2), **kw)
    assert row_certifies("q02_beta", row(sha2 + "-dirty"), **kw)
    # UNCOMMITTED edit to q01: the sha2 row stops certifying q01 (the
    # gate diffs sha..working-tree, not sha..HEAD)
    qfile.write_text("def q01_alpha():\n    return 7\n\ndef q02_beta():\n    return 99\n")
    assert not row_certifies("q01_alpha", row(sha2), **kw)
    assert row_certifies("q02_beta", row(sha2), **kw)
    # fail-closed branches: unknown / unresolvable sha, red verdict,
    # row older than the round boundary
    assert not row_certifies("q01_alpha", row("unknown"), **kw)
    assert not row_certifies("q01_alpha", row("0" * 40), **kw)
    assert not row_certifies("q01_alpha", row(sha2, verdict="FAIL"), **kw)
    assert not row_certifies("q01_alpha", row(sha2, at=boundary - 1), **kw)
    # legacy pre-r9 row (no sha): timestamp-only gate
    assert row_certifies("q01_alpha", row(), **kw)
    assert not row_certifies("q01_alpha", row(at=boundary - 1), **kw)


def _scratch_pkg(tmp_path):
    """Scratch repo with a queries.py + two library modules: q01 reaches
    functions/alpha.py (module-level import) -> functions/common.py
    (transitive); q02 reaches functions/beta.py (function-local import).
    Helper indirection (_helper) exercises the call fixpoint."""
    repo = str(tmp_path)
    _git(repo, "init", "-q")
    pkg = tmp_path / "apache_arrow_spark"
    fns = pkg / "functions"
    fns.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (fns / "__init__.py").write_text("")
    (fns / "common.py").write_text("def c():\n    return 0\n")
    (fns / "alpha.py").write_text(
        "from apache_arrow_spark.functions.common import c\n"
        "def helper_a():\n    return c()\n"
    )
    (fns / "beta.py").write_text("def helper_b():\n    return 1\n")
    (pkg / "queries.py").write_text(
        "from apache_arrow_spark.functions.alpha import helper_a\n"
        "def _helper():\n    return helper_a()\n"
        "def q01_alpha():\n    return _helper()\n"
        "def q02_beta():\n"
        "    from apache_arrow_spark.functions.beta import helper_b\n"
        "    return helper_b()\n"
    )
    _git(repo, "add", "-A")
    _git(repo, "commit", "-q", "-m", "one")
    return repo


def test_query_module_deps_transitive(tmp_path):
    from tools.certify import query_module_deps

    repo = _scratch_pkg(tmp_path)
    deps = query_module_deps(repo)
    # module-level import, via the _helper call fixpoint, plus closure
    assert deps["q01_alpha"] == [
        "apache_arrow_spark/functions/alpha.py",
        "apache_arrow_spark/functions/common.py",
    ]
    # function-local import; beta has no further intra-package deps
    assert deps["q02_beta"] == ["apache_arrow_spark/functions/beta.py"]


def test_library_file_edit_invalidates_dependent_sweep_rows(tmp_path):
    """r9 verdict #2: a diff in a reached library module must stop a
    sweep row certifying every query that reaches it, while queries that
    don't reach the file keep certifying."""
    from tools.certify import query_module_deps

    repo = _scratch_pkg(tmp_path)
    sha1 = _head(repo)
    deps = query_module_deps(repo)
    now = time.time()
    kw = dict(boundary_ts=now - 3600, repo=repo)
    row = {"verdict": "full", "at": now, "sha": sha1}

    # clean tree: both certify
    assert row_certifies("q01_alpha", row, deps=deps["q01_alpha"], **kw)
    assert row_certifies("q02_beta", row, deps=deps["q02_beta"], **kw)

    # COMMITTED edit to beta.py: q02 invalidated, q01 survives
    beta = tmp_path / "apache_arrow_spark" / "functions" / "beta.py"
    beta.write_text("def helper_b():\n    return 2\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-q", "-m", "two")
    assert not row_certifies("q02_beta", row, deps=deps["q02_beta"], **kw)
    assert row_certifies("q01_alpha", row, deps=deps["q01_alpha"], **kw)
    sha2 = _head(repo)
    row2 = {"verdict": "full", "at": now, "sha": sha2}
    assert row_certifies("q02_beta", row2, deps=deps["q02_beta"], **kw)

    # UNCOMMITTED edit to the TRANSITIVE dep (common.py): q01 invalidated
    # through the closure, q02 still fine
    common = tmp_path / "apache_arrow_spark" / "functions" / "common.py"
    common.write_text("def c():\n    return 9\n")
    assert not row_certifies("q01_alpha", row2, deps=deps["q01_alpha"], **kw)
    assert row_certifies("q02_beta", row2, deps=deps["q02_beta"], **kw)

    # deps omitted (legacy caller): old fail-open behavior — documents
    # that the gate is only closed when the dep map is supplied
    assert row_certifies("q01_alpha", row2, **kw)
