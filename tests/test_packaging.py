"""The repo must be pip-installable: pyproject.toml + setuptools
build_meta produce a distribution whose file list covers every
subpackage. Built via the PEP 517 API directly (the sandbox has no
`wheel`/`build` package and installs must not write outside the repo),
into a tmp dir — the artifact itself is evidence, not a fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tarfile


def test_sdist_builds_and_contains_all_subpackages(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # build_sdist must run with cwd=repo (PEP 517 contract); do it in a
    # subprocess so the in-process cwd/test state is untouched.
    code = (
        "from setuptools.build_meta import build_sdist;"
        f"print(build_sdist({str(tmp_path)!r}))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    name = out.stdout.strip().splitlines()[-1]
    sdist = tmp_path / name
    assert sdist.exists()

    with tarfile.open(sdist) as tf:
        names = tf.getnames()
    files = {n.split("/", 1)[1] for n in names if "/" in n}
    for sub in ("operators", "sources", "functions", "streaming"):
        assert f"cs6300_vectordbs_spark/{sub}/__init__.py" in files, sub
    assert "cs6300_vectordbs_spark/session.py" in files
    assert "pyproject.toml" in files
    # Test/driver scaffolding must NOT ship in the distribution.
    assert not any(f.startswith("tests/") for f in files)
    assert "__spark_entry__.py" not in files


def test_version_matches_pyproject():
    import tomllib

    import cs6300_vectordbs_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["version"] == pkg.__version__
