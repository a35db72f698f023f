"""Real image decode seam (round-3 verdict #9): the PIL-backed path runs
wherever an image library exists (skip-if-absent), and the gated stub fails
with the documented NotImplementedError where it doesn't — both sides of the
seam are pinned, so the plumbing is exercised in every environment.
"""

import pytest

from kioss_spark.operators import multimodal as M


def test_probe_png_is_wellformed():
    p = M._PROBE_PNG
    assert p.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in p and b"IDAT" in p and p.endswith(b"IEND\xaeB`\x82")


def test_decode_real_raises_without_pil():
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL installed; covered by test_decode_real_with_pil")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="image library"):
        M.decode_image_real(M._PROBE_PNG)


def test_decode_real_with_pil():
    pytest.importorskip("PIL")
    w, h, fmt, mode = M.decode_image_real(M._PROBE_PNG)
    assert (w, h) == (1, 1)
    assert fmt == "PNG"


def test_image_meta_real_pipeline(spark):
    pytest.importorskip("PIL")
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"]).select(
        F.col("doc_id").cast("long"),
        F.lit(M._PROBE_PNG).alias("payload"),
        F.struct(F.lit("image/png").alias("fmt"), F.lit(len(M._PROBE_PNG)).cast("long").alias("n_bytes")).alias("meta"),
    )
    out = M.image_meta_real(docs).collect()
    assert len(out) == 2
    assert all(r["width"] == 1 and r["height"] == 1 and r["fmt"] == "PNG" for r in out)


def test_image_meta_real_fails_fast_without_pil(spark):
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL installed")
    except ImportError:
        pass
    from pyspark.sql import functions as F

    docs = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.lit(M._PROBE_PNG).alias("payload"),
        F.struct(F.lit("x").alias("fmt"), F.lit(0).cast("long").alias("n_bytes")).alias("meta"),
    )
    with pytest.raises(NotImplementedError):
        M.image_meta_real(docs)  # plan build, before any job


def test_scene_cuts_segments_on_frame_change(spark):
    from kioss_spark.operators.multimodal import frame_sample, scene_cuts

    # 3 identical 48-char "frames" of A, then 2 of B, then 1 of C:
    # scene boundaries exactly at the A->B and B->C transitions
    text = "A" * 144 + "B" * 96 + "C" * 48
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    frames = frame_sample(docs, frame_chars=48, stride=1)
    out = sorted(
        (r["frame_idx"], r["is_cut"], r["scene_id"])
        for r in scene_cuts(frames, cut_hamming=1).collect()
    )
    assert out == [
        (0, True, 0), (1, False, 0), (2, False, 0),
        (3, True, 1), (4, False, 1),
        (5, True, 2),
    ], out


def test_scene_cuts_single_scene_when_static(spark):
    from kioss_spark.operators.multimodal import frame_sample, scene_cuts

    docs = spark.createDataFrame([(7, "Z" * 480)], "doc_id long, text string")
    frames = frame_sample(docs, frame_chars=48, stride=1)
    rows = scene_cuts(frames, cut_hamming=1).collect()
    assert all(r["scene_id"] == 0 for r in rows)
    assert sum(r["is_cut"] for r in rows) == 1  # only the opening frame


def test_image_resize_fake_dims_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 30)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in M.image_resize(M.with_payload(df)).collect()}
    for r in out.values():
        # aspect-preserving: longest side exactly 64 (sources are > 64 here),
        # never upscaled, minimum 1
        assert max(r["width"], r["height"]) == 64
        assert 1 <= r["width"] <= r["src_width"]
        assert 1 <= r["height"] <= r["src_height"]
    # fake decoder contract: dims derive from payload length
    n = 100
    assert out[1]["src_width"] == 64 + n % 448
    assert out[1]["src_height"] == 64 + (n * 7) % 448
    again = {r["doc_id"]: r["thumb_md5"]
             for r in M.image_resize(M.with_payload(df)).collect()}
    assert again == {k: v["thumb_md5"] for k, v in out.items()}


def test_image_resize_real_fails_fast_without_pil(spark):
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL installed; covered by test_image_resize_real_with_pil")
    except ImportError:
        pass
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError, match="image library"):
        # plan build must fail fast, before any job runs
        M.image_resize(M.with_payload(df), real=True)


def test_image_resize_real_with_pil(spark):
    pytest.importorskip("PIL")
    pngs = spark.createDataFrame([(7, bytearray(M._PROBE_PNG))],
                                 "doc_id long, payload binary")
    out = M.image_resize(pngs, real=True).collect()
    assert len(out) == 1 and out[0]["src_width"] == 1 and out[0]["width"] == 1


def test_average_hash_real_fails_fast_without_pil(spark):
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL installed; covered by test_average_hash_real_with_pil")
    except ImportError:
        pass
    pngs = spark.createDataFrame([(1, bytearray(M._PROBE_PNG))],
                                 "doc_id long, payload binary")
    with pytest.raises(NotImplementedError, match="image library"):
        M.average_hash_real(pngs)  # plan build, before any job


def test_average_hash_real_with_pil(spark):
    pytest.importorskip("PIL")
    import io

    import PIL.Image

    pngs = spark.createDataFrame([(9, bytearray(M._PROBE_PNG))],
                                 "doc_id long, payload binary")
    out = M.average_hash_real(pngs).collect()
    assert len(out) == 1
    # parity: same packing as the reference on the resized pixel stream
    with PIL.Image.open(io.BytesIO(M._PROBE_PNG)) as img:
        px = list(img.convert("L").resize((8, 8)).getdata())
    assert out[0]["phash"] == M.average_hash_py(px, cells=64)
    # a uniform 1x1 image has no above-mean cell (strict >): hash == 0
    assert out[0]["phash"] == 0
    # no frame_idx on the input -> constant 0, so the output slots into
    # phash_near_dup / scene_cuts as documented
    assert out[0]["frame_idx"] == 0
    framed = spark.createDataFrame(
        [(9, 4, bytearray(M._PROBE_PNG))],
        "doc_id long, frame_idx long, payload binary",
    )
    out2 = M.average_hash_real(framed).collect()
    assert out2[0]["frame_idx"] == 4 and out2[0]["phash"] == 0
    # the documented composition resolves (plan build is enough)
    M.phash_near_dup(M.average_hash_real(framed))
