"""Media-blob boundary A/B harness (VERDICT r10 #3).

The multimodal metadata operators (audio/video codec info, feature
extraction) APPEND columns to media rows. The round-10 implementation
was a ``mapInPandas`` over the full row: every column — including the
multi-MB ``content`` blob — crossed the Arrow boundary JVM→Python and
back. The round-11 shape (:func:`multimodal._attach_struct`) is a
scalar Arrow ``pandas_udf`` returning one struct column: only the
parse inputs cross into Python, only the tiny struct returns, and the
blob never leaves the JVM.

This harness makes that measurable on media-shaped data (no media
table exists in the bench corpus):

1. builds a deterministic synthetic corpus — AVC mp4s, AAC mp4s and
   junk blobs with mdat padding to realistic sizes (default ~700 MB
   total) — under /dev/shm, written as parquet (path, content,
   media_type);
2. proves parity: the old and new routes produce identical row sets
   (row-order-independent hash, same fold as collapse_ab.py);
3. times both routes per operator, interleaved median-of-N, noop sink
   (guide §1.4);
4. reads the Arrow-boundary byte metrics (``data sent to Python
   workers`` / ``data returned from Python workers``) off the executed
   plan of one extra untimed run per route, so the "halved boundary
   bytes" claim is a measured number, not an inference.

Usage: python scripts/media_ab.py [n_per_kind] [runs]
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("GCPDE_SPARK_WAREHOUSE", "/dev/shm/gcpde_spark_media_wh")

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from gcpde_spark.llm import multimodal as mm
from gcpde_spark.session import build_session

N_PER_KIND = int(sys.argv[1]) if len(sys.argv) > 1 else 256
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DATA_DIR = "/dev/shm/gcpde_media_ab" if os.path.isdir("/dev/shm") else "/tmp/gcpde_media_ab"


def _pad(tag: bytes, n: int) -> bytes:
    """n deterministic pseudo-random bytes (sha256 counter stream)."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.sha256(tag + c.to_bytes(4, "big")).digest()
        c += 1
    return bytes(out[:n])


def _box(t: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + t + body


def _gen_corpus(spark) -> str:
    """Deterministic media corpus: per kind, N files whose sizes cycle
    256 KB / 512 KB / 1 MB / 2 MB (mdat padding after the real
    ftyp+moov, so every parser sees the same boxes it would in a
    faststart file)."""
    from test_llm import _make_mp4_aac, _make_mp4_avc, _make_sps

    out = Path(DATA_DIR)
    if (out / "_done").exists():
        return str(out / "media.parquet")
    out.mkdir(parents=True, exist_ok=True)
    sizes = [256 << 10, 512 << 10, 1 << 20, 2 << 20]
    avc_head = _make_mp4_avc(
        _make_sps(profile=66, w_mbs=120, h_mbs=68, crop=(0, 0, 0, 4)),
        w=1920,
        h=1080,
    )
    aac_head = _make_mp4_aac()
    rows = []
    for i in range(N_PER_KIND):
        size = sizes[i % len(sizes)]
        rows.append(
            (f"v{i:05d}.mp4", avc_head + _box(b"mdat", _pad(b"v%d" % i, size)), "video")
        )
        rows.append(
            (f"a{i:05d}.mp4", aac_head + _box(b"mdat", _pad(b"a%d" % i, size)), "audio")
        )
        rows.append((f"j{i:05d}.bin", _pad(b"j%d" % i, size // 2), "other"))
    pdf = pd.DataFrame(rows, columns=["path", "content", "media_type"])
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
        str(out / "media.parquet")
    )
    (out / "_done").touch()
    return str(out / "media.parquet")


# --- the round-10 round-trip route, kept verbatim for the A/B arm -----------


def _roundtrip(df, fields, in_cols, parse):
    """The pre-r11 shape: mapInPandas over every column, all columns +
    metadata emitted back out of Python."""
    from collections.abc import Iterator

    out_schema = StructType(list(df.schema.fields) + fields)
    cols = [f.name for f in df.schema.fields]

    def _batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            infos = parse(*[pdf[c] for c in in_cols])
            out = pdf[cols].copy()
            for field in fields:
                out[field.name] = [i.get(field.name) for i in infos]
            yield out

    return df.mapInPandas(_batch, out_schema)


def _ops(df):
    """(name, old_route_df, new_route_df) per shipped metadata operator."""
    from pyspark.sql.types import BooleanType, StructField

    def audio_parse(content):
        return [mm._mp4_audio_codec_info(bytes(c or b"")) or {} for c in content]

    def video_parse(content):
        return [mm._mp4_codec_info(bytes(c or b"")) or {} for c in content]

    def feat_parse(content, mtype):
        infos = []
        for c, t in zip(content, mtype):
            raw = bytes(c or b"")
            vec = mm._real_features(raw, t, 64)
            infos.append(
                {
                    "features": vec if vec is not None else _hash64(raw),
                    "features_real": vec is not None,
                }
            )
        return infos

    def _hash64(raw: bytes) -> list[float]:
        vals: list[float] = []
        counter = 0
        while len(vals) < 64:
            h = hashlib.sha256(raw + counter.to_bytes(4, "big")).digest()
            vals.extend(b / 255.0 - 0.5 for b in h)
            counter += 1
        return vals[:64]

    from pyspark.sql.types import ArrayType, FloatType

    feat_fields = [
        StructField("features", ArrayType(FloatType()), True),
        StructField("features_real", BooleanType(), True),
    ]
    yield (
        "audio_codec_info",
        _roundtrip(df, mm._AUDIO_CODEC_FIELDS, ["content"], audio_parse),
        mm.audio_codec_info(df),
    )
    yield (
        "video_codec_info",
        _roundtrip(df, mm._CODEC_FIELDS, ["content"], video_parse),
        mm.video_codec_info(df),
    )
    yield (
        "extract_features_real",
        _roundtrip(df, feat_fields, ["content", "media_type"], feat_parse),
        mm.extract_features(df, dim=64, features="real"),
    )


def _row_hash(df) -> dict:
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
        for c in df.columns
    ]
    h = F.xxhash64(F.concat_ws("\x01", *cols))
    row = (
        df.select(h.alias("_h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("s"),
            F.bit_xor("_h").alias("x"),
        )
        .first()
    )
    return {"n": int(row["n"]), "s": str(row["s"]), "x": int(row["x"])}


def _python_boundary_bytes(df) -> dict:
    """Execute df's own plan object once and read the Python-runner byte
    metrics off it (driver-side accumulator values)."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    sent = recv = 0
    stack = [qe.executedPlan()]
    while stack:
        node = stack.pop()
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            name = kv._2().name().get() if kv._2().name().isDefined() else ""
            if "sent to Python" in name:
                sent += kv._2().value()
            elif "returned from Python" in name:
                recv += kv._2().value()
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return {"sent_mb": round(sent / 1e6, 1), "recv_mb": round(recv / 1e6, 1)}


def main() -> None:
    confs = {
        "spark.sql.files.maxPartitionBytes": str(32 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_media"
    spark = build_session(app_name="gcpde_media_ab", extra_confs=confs)
    path = _gen_corpus(spark)
    df = spark.read.parquet(path)
    n = df.count()
    total_mb = df.agg(F.sum(F.length("content"))).first()[0] / 1e6
    print(json.dumps({"rows": n, "content_mb": round(total_mb, 1)}), flush=True)

    # parity + boundary metrics (one untimed pass per route)
    for name, old_df, new_df in _ops(df):
        ho, hn = _row_hash(old_df), _row_hash(new_df)
        rec = {"op": name, "parity": ho == hn, "old_hash": ho, "new_hash": hn}
        try:
            rec["old_boundary"] = _python_boundary_bytes(old_df)
            rec["new_boundary"] = _python_boundary_bytes(new_df)
        except Exception as e:  # noqa: BLE001 — metrics are best-effort
            rec["boundary_err"] = str(e)[:200]
        print(json.dumps(rec), flush=True)
        if not rec["parity"]:
            spark.stop()
            sys.exit(1)

    samples: dict[tuple[str, str], list[float]] = {}
    for r in range(RUNS):
        for name, old_df, new_df in _ops(df):
            for variant, vdf in (("roundtrip", old_df), ("struct", new_df)):
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"{name} {variant} r{r}")
                t0 = time.perf_counter()
                vdf.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                samples.setdefault((name, variant), []).append(dt)
                print(
                    json.dumps(
                        {"op": name, "variant": variant, "run": r, "sec": round(dt, 3)}
                    ),
                    flush=True,
                )
    summary = {
        f"{op}/{v}": {
            "median_sec": round(statistics.median(vals), 3),
            "all": [round(x, 3) for x in vals],
        }
        for (op, v), vals in samples.items()
    }
    print(json.dumps({"summary": summary, "rows": n, "runs": RUNS}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
