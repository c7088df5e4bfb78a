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
