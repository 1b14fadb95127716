"""Build the gcpde-spark wheel.

Preferred path: setuptools' ``bdist_wheel`` (via ``pip wheel``), the
standard toolchain. Fallback: a minimal PEP 427 builder — a wheel is a
zip of the package tree plus a ``*.dist-info`` directory (METADATA from
setuptools' own ``dist_info`` command, a static WHEEL file, and a RECORD
manifest of sha256 digests) — used where the ``wheel``/``build``
packages are unavailable (this sandbox ships setuptools 65 without
them). The fallback produces a pure-Python ``py3-none-any`` wheel that
``pip install`` accepts; parity with the preferred path is the zip
contents, not byte-identity.

Usage: ``python scripts/build_wheel.py [outdir]`` (default ``dist/``).
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import os
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGE = "gcpde_spark"


def _try_standard(outdir: Path) -> bool:
    """The real toolchain, when the `wheel` package is importable."""
    try:
        import wheel  # noqa: F401
    except ImportError:
        return False
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "pip",
            "wheel",
            str(REPO),
            "--no-deps",
            "--no-build-isolation",
            "-w",
            str(outdir),
        ],
        capture_output=True,
        text=True,
    )
    if res.returncode != 0:
        print(res.stderr, file=sys.stderr)
    return res.returncode == 0


def _dist_info_metadata(tmp: Path) -> tuple[str, str, str]:
    """Generate core metadata via setuptools' ``egg_info`` and return
    (name, version, metadata_text).

    ``egg_info``'s PKG-INFO is the same core-metadata format a wheel's
    METADATA uses; the ``dist_info`` command would be more direct, but
    on setuptools 65 it imports ``bdist_wheel`` to compute the tag and
    fails without the ``wheel`` package — the very situation this
    fallback exists for.
    """
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.argv = ['setup.py', 'egg_info', '--egg-base', "
            f"{str(tmp)!r}]; import setuptools; setuptools.setup()",
        ],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    (egg_info,) = [p for p in tmp.iterdir() if p.name.endswith(".egg-info")]
    metadata = (egg_info / "PKG-INFO").read_text()
    head = metadata.split("\n\n", 1)[0]  # headers end at the first blank line
    headers = dict(
        line.split(": ", 1)
        for line in head.splitlines()
        if ": " in line and not line.startswith(" ")
    )
    name = headers["Name"].replace("-", "_")
    version = headers["Version"]
    return name, version, metadata


def _urlsafe_b64(digest: bytes) -> str:
    return base64.urlsafe_b64encode(digest).rstrip(b"=").decode("ascii")


def _fallback(outdir: Path) -> Path:
    with tempfile.TemporaryDirectory() as td:
        name, version, metadata = _dist_info_metadata(Path(td))
    tag = "py3-none-any"
    wheel_name = f"{name}-{version}-{tag}.whl"
    dist_info = f"{name}-{version}.dist-info"
    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: gcpde-spark-build-wheel (pep427-fallback)\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {tag}\n"
    )

    records: list[tuple[str, str, int]] = []
    out = outdir / wheel_name
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:

        def add(arcname: str, data: bytes) -> None:
            zf.writestr(arcname, data)
            digest = hashlib.sha256(data).digest()
            records.append((arcname, f"sha256={_urlsafe_b64(digest)}", len(data)))

        pkg_root = REPO / PACKAGE
        for path in sorted(pkg_root.rglob("*.py")):
            if "__pycache__" in path.parts:
                continue
            arc = str(path.relative_to(REPO)).replace(os.sep, "/")
            add(arc, path.read_bytes())
        add(f"{dist_info}/METADATA", metadata.encode())
        add(f"{dist_info}/WHEEL", wheel_meta.encode())
        license_file = REPO / "LICENSE"
        if license_file.exists():
            add(f"{dist_info}/licenses/LICENSE", license_file.read_bytes())

        buf = io.StringIO()
        writer = csv.writer(buf, lineterminator="\n")
        for row in records:
            writer.writerow(row)
        writer.writerow((f"{dist_info}/RECORD", "", ""))
        zf.writestr(f"{dist_info}/RECORD", buf.getvalue())
    return out


def main() -> None:
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist"
    outdir.mkdir(parents=True, exist_ok=True)
    if _try_standard(outdir):
        built = sorted(outdir.glob("*.whl"), key=lambda p: p.stat().st_mtime)[-1]
        print(f"built (bdist_wheel): {built}")
        return
    built = _fallback(outdir)
    print(f"built (pep427 fallback): {built}")


if __name__ == "__main__":
    main()
