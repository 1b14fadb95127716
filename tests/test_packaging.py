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
