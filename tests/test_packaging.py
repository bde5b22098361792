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


def _build_sdist(tmp_path) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "from setuptools.build_meta import build_sdist;"
        f"print(build_sdist({str(tmp_path)!r}))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return str(tmp_path / out.stdout.strip().splitlines()[-1])


def test_built_artifact_is_importable_without_source_tree(tmp_path):
    """Close the install loop vendor-free: unpack the BUILT sdist and
    import the package from it in a clean subprocess whose sys.path
    does NOT contain the repo — proving the artifact (not the source
    tree) carries a complete, importable package. This is the
    no-network stand-in for `pip install` (see
    test_pip_install_from_sdist for the wheel-capable path)."""
    sdist = _build_sdist(tmp_path)
    unpack = tmp_path / "unpacked"
    with tarfile.open(sdist) as tf:
        tf.extractall(unpack)
    (root,) = [d for d in os.listdir(unpack)]
    pkg_root = str(unpack / root)

    probe = (
        "import sys, os\n"
        # simulate 'not the source tree': drop repo/cwd entries
        "sys.path = [p for p in sys.path if not p.rstrip('/').endswith('repo')]\n"
        "sys.path.insert(0, %r)\n"
        "import cs6300_vectordbs_spark as pkg\n"
        "from cs6300_vectordbs_spark.operators.dedup import minhash_lsh_pairs\n"
        "from cs6300_vectordbs_spark.sources.dedup_index import probe_dedup_index\n"
        "from cs6300_vectordbs_spark.functions.vector import cosine_sim\n"
        "from cs6300_vectordbs_spark.streaming.upsert_sink import start_stream_upsert\n"
        "assert pkg.__file__.startswith(%r), pkg.__file__\n"
        "print(pkg.__version__)\n"
    ) % (pkg_root, pkg_root)
    out = subprocess.run(
        [sys.executable, "-c", probe],
        cwd=str(tmp_path),  # NOT the repo
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip() == "0.1.0"


def test_pip_install_from_sdist(tmp_path):
    """The real `pip install` loop — runs wherever a wheel backend is
    available (pip's metadata step needs bdist_wheel; setuptools < 70
    requires the `wheel` package, absent in this sandbox and
    uninstallable offline). Skipped, not xfailed, when blocked: the
    unpack-and-import test above covers artifact completeness
    everywhere."""
    import importlib.util

    import pytest

    if importlib.util.find_spec("wheel") is None:
        pytest.skip("no `wheel` module and no network to install one")
    sdist = _build_sdist(tmp_path)
    target = str(tmp_path / "site")
    out = subprocess.run(
        [
            sys.executable, "-m", "pip", "install", "--no-index",
            "--no-deps", "--no-build-isolation", "--target", target, sdist,
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    probe = (
        "import sys; sys.path.insert(0, %r)\n"
        "import cs6300_vectordbs_spark as pkg\n"
        "assert pkg.__file__.startswith(%r)\n"
        "print(pkg.__version__)\n"
    ) % (target, target)
    out = subprocess.run(
        [sys.executable, "-c", probe],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip() == "0.1.0"
