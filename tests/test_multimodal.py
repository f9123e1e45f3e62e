"""Multimodal plumbing tests: binary columns, Arrow batch shapes, stubbed
decode/resize/frame-sample determinism."""

from __future__ import annotations

import hashlib

import pytest


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(app_name="pytest-mm", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _media(spark):
    from oxidizepdf_spark.multimodal import synth_media_table
    from oxidizepdf_spark.queries import norm_col

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", norm_col("text").alias("norm")
    )
    return synth_media_table(spark, docs)


def test_media_features_schema_and_determinism(spark):
    from oxidizepdf_spark.multimodal import extract_media_features, fake_embedding

    media = _media(spark)
    feats = extract_media_features(media)
    rows = {(r["doc_id"], r["media_ref"]): r for r in feats.collect()}
    assert len(rows) == media.count()
    # deterministic: recompute one row's features locally
    sample = media.where("media_type = 'image'").limit(1).collect()[0]
    key = (sample["doc_id"], sample["media_ref"])
    payload = bytes(sample["payload"])
    assert rows[key]["sha1"] == hashlib.sha1(payload).hexdigest()
    emb = [round(float(x), 6) for x in rows[key]["fake_embedding"]]
    assert emb == [round(v, 6) for v in fake_embedding(payload)]
    assert rows[key]["decoder"] == "stub"
    assert rows[key]["n_bytes"] == len(payload)


def test_frame_sampling_video_rows_only(spark):
    from oxidizepdf_spark.multimodal import sample_frames

    media = _media(spark)
    frames = sample_frames(media, every_ms=1000)
    got = frames.collect()
    assert all(r["media_ref"].startswith("media://vid/") for r in got)
    # duration 3000-7000ms at 1000ms stride → 3-7 frames per video
    by_ref = {}
    for r in got:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    for ref, idxs in by_ref.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert 3 <= len(idxs) <= 7


def test_decode_and_resize_stubs_deterministic():
    from oxidizepdf_spark.multimodal import decode_image_stub, resize_image_stub

    d1 = decode_image_stub(b"payload-bytes", {"width": 10, "height": 20})
    d2 = decode_image_stub(b"payload-bytes", {"width": 10, "height": 20})
    assert d1 == d2
    assert d1["width"] == 10 and d1["height"] == 20
    # no metadata → dimensions derived deterministically from the bytes
    d3 = decode_image_stub(b"payload-bytes", None)
    assert 1 <= d3["width"] <= 1024
    r1 = resize_image_stub(b"x" * 1000, (32, 32))
    assert r1 == resize_image_stub(b"x" * 1000, (32, 32))
    assert r1[:8] == (32).to_bytes(4, "big") + (32).to_bytes(4, "big")


def test_zip_deployment_kernel_loads_from_zip():
    """spark-submit --py-files simulation (north_rule deployment story):
    the package shipped as a ZIP on a bare sys.path must import, extract
    documents, AND compile the C kernel from its zipped source
    (importlib.resources path in cbuild) into a fresh cache."""
    import os
    import subprocess
    import sys
    import tempfile
    import zipfile

    import oxidizepdf_spark

    pkg_dir = os.path.dirname(os.path.abspath(oxidizepdf_spark.__file__))
    with tempfile.TemporaryDirectory() as td:
        zpath = os.path.join(td, "oxidizepdf_spark.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith((".pyc",)):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
        prog = (
            "import sys, json\n"
            "sys.path.insert(0, %r)\n"
            "from oxidizepdf_spark.kernel import content\n"
            "from oxidizepdf_spark.corpus import generate_corpus\n"
            "from oxidizepdf_spark.kernel.extract import extract_document_spans\n"
            "ok = 0\n"
            "for in_row, _ in generate_corpus(n_docs=6, seed=3):\n"
            "    spans, meta = extract_document_spans(\n"
            "        [(s['kind'], s['text'], s['media_ref']) for s in in_row['spans']])\n"
            "    ok += int(meta['ok'])\n"
            "print(json.dumps({'ok': ok, 'c': content._CSCAN is not None,\n"
            "                  'html': bool(getattr(content._CSCAN, 'html_ready', False)),\n"
            "                  'layout': bool(getattr(content._CSCAN, 'layout_ready', False))}))\n"
        ) % zpath
        env = dict(os.environ)
        # fresh cache: the compile must work from the ZIPPED .c source
        env["XDG_CACHE_HOME"] = os.path.join(td, "cache")
        env.pop("PYTHONPATH", None)
        # This test validates zip C compilation specifically: the outer
        # suite's kill switches (e.g. an OXPDF_NO_CKERNEL fallback run)
        # must not leak into the subprocess and defeat the assertion.
        for kill in ("OXPDF_NO_CKERNEL", "OXPDF_NO_CLAYOUT", "OXPDF_NO_CHTML"):
            env.pop(kill, None)
        proc = subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=td,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        import json

        out = json.loads(proc.stdout.strip().splitlines()[-1])
        assert out["ok"] == 6
        assert out["c"] and out["html"] and out["layout"], out


def test_decode_image_native_jpeg_and_png():
    import numpy as np
    from oxidizepdf_spark.kernel.extract_images import encode_png
    from oxidizepdf_spark.kernel.jpeg_codec import decode_jpeg, encode_jpeg
    from oxidizepdf_spark.multimodal import decode_image_stub

    gray = np.tile(np.linspace(0, 255, 24).astype(np.uint8), (16, 1))
    jpeg = encode_jpeg(gray, quality=100)
    d = decode_image_stub(jpeg, None)
    assert (d["width"], d["height"], d["decoder"]) == (24, 16, "native")
    # checksum is over the real pixels (q100 gradient roundtrips exactly)
    import hashlib
    assert d["checksum"] == hashlib.md5(
        decode_jpeg(jpeg)[0].tobytes()
    ).hexdigest() == hashlib.md5(gray[..., None].tobytes()).hexdigest()

    png = encode_png(gray.tobytes(), 24, 16, 1, 8)
    d = decode_image_stub(png, None)
    assert (d["width"], d["height"], d["decoder"]) == (24, 16, "native")

    # non-image payload still takes the deterministic fake path
    d = decode_image_stub(b"not an image", None)
    assert d["decoder"] == "stub"


def test_resize_native_roundtrip():
    import numpy as np
    from oxidizepdf_spark.kernel.jpeg_codec import decode_jpeg, encode_jpeg
    from oxidizepdf_spark.multimodal import resize_image_stub

    yy, xx = np.mgrid[0:40, 0:60]
    img = np.stack(
        [(xx * 4) % 256, (yy * 3) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    out = resize_image_stub(encode_jpeg(img, quality=95), (30, 20))
    assert out[:2] == b"\xff\xd8"  # real JPEG back out
    pix, info = decode_jpeg(out)
    assert (info["width"], info["height"]) == (30, 20)

    # fake path untouched for undecodable bytes
    fake = resize_image_stub(b"x" * 1000, (32, 32))
    assert fake[:4] == (32).to_bytes(4, "big")
