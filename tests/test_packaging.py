"""Packaging metadata (`pyproject.toml`): the engine must be installable
as a distribution — name, version floor, entry point, and complete
subpackage discovery.  A full `pip install -e` needs the `wheel` package
(absent in this sandbox), so the deepest runnable proof is building an
sdist through the PEP 517 backend and checking its file set — which is
exactly what an index upload would ship."""

from __future__ import annotations

import os
import sys
import tarfile
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import tomllib
except ImportError:  # pragma: no cover - py<3.11
    tomllib = None


@pytest.fixture(scope="module")
def pyproject():
    if tomllib is None:
        pytest.skip("tomllib requires Python >= 3.11")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_metadata_floors(pyproject):
    proj = pyproject["project"]
    assert proj["name"] == "hive-serde-schema-gen-spark"
    assert any(d.startswith("pyspark>=3.4") for d in proj["dependencies"])
    assert "duckdb" in proj["optional-dependencies"]["dev"]
    assert proj["requires-python"] == ">=3.10"
    # console entry point targets the real CLI main
    from hive_serde_schema_gen_spark.cli import main  # noqa: F401

    assert (
        proj["scripts"]["hive-serde-schema-gen-spark"]
        == "hive_serde_schema_gen_spark.cli:main"
    )


def test_sdist_contains_every_subpackage(pyproject):
    from setuptools import build_meta

    out = tempfile.mkdtemp(prefix="sdist-test-")
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        name = build_meta.build_sdist(out)
    finally:
        os.chdir(cwd)
        # build_sdist leaves an egg-info dir in the source tree
        import shutil

        shutil.rmtree(
            os.path.join(REPO, "hive_serde_schema_gen_spark.egg-info"),
            ignore_errors=True,
        )
    with tarfile.open(os.path.join(out, name)) as t:
        names = t.getnames()
    shipped = {
        os.path.dirname(n).split("/", 1)[1]
        for n in names
        if n.endswith("__init__.py")
    }
    on_disk = set()
    pkg_root = os.path.join(REPO, "hive_serde_schema_gen_spark")
    for dirpath, _, files in os.walk(pkg_root):
        if "__init__.py" in files:
            on_disk.add(os.path.relpath(dirpath, REPO))
    assert shipped == on_disk, shipped ^ on_disk
    # every .py module under the package ships
    disk_mods = set()
    for dirpath, _, files in os.walk(pkg_root):
        for f in files:
            if f.endswith(".py"):
                disk_mods.add(os.path.relpath(os.path.join(dirpath, f), REPO))
    shipped_mods = {
        n.split("/", 1)[1]
        for n in names
        if n.endswith(".py") and "/hive_serde_schema_gen_spark/" in n
    }
    assert disk_mods <= shipped_mods, disk_mods - shipped_mods


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
