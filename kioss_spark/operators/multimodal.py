"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed in Arrow-batched Pandas over
``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): the
"decoder" is a clearly-marked deterministic fake deriving metadata from the
payload bytes, so the Spark-side plumbing — schema, batching, UDF signature,
partition behavior — is real and tested, and the DuckDB oracle can verify it
end-to-end. Swap ``_fake_decode_meta`` for PIL/ffmpeg in a real deployment
(``decode_image_real`` shows the gated seam).

Scale notes: binary payloads ride the scan (parquet BYTE_ARRAY, column-pruned
when untouched); metadata extraction is a narrow mapInPandas (no shuffle);
frame sampling fans out rows but stays narrow (explode, no shuffle).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "with_payload",
    "image_meta",
    "image_resize",
    "frame_sample",
    "frame_dedup",
    "decode_image_real",
    "average_hash_py",
    "average_hash_expr",
    "with_average_hash",
    "average_hash_real",
    "phash_near_dup",
]

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def with_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    The fixtures carry no real media, so the payload is the utf-8 bytes of
    the text column — the *schema shape* (binary + struct metadata) is what a
    real pipeline would carry for image/audio blobs.
    """
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("img/fake").alias("fmt"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """DETERMINISTIC FAKE decode — stands in for an image decoder.
    Derives (n_bytes, width, height, md5) purely from the payload so the
    oracle can reproduce it. Real decode: see decode_image_real."""
    n = len(payload)
    return n, 64 + n % 448, 64 + (n * 7) % 448, hashlib.md5(payload).hexdigest()


def image_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    This is the real plumbing: mapInPandas receives pandas batches of bytes
    objects, emits a typed result frame — exactly how a PIL/libvips decode
    would run, minus the actual codec.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "fmt": [m["fmt"] for m in pdf["meta"]],
                    "n_bytes": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "checksum": [r[3] for r in rows],
                }
            )

    return docs_with_payload.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def frame_sample(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    frame_chars: int = 48,
    stride: int = 4,
) -> DataFrame:
    """"Video" frame sampling: treat the document as a sequence of
    fixed-width frames, keep every ``stride``-th, fingerprint each.

    Runs in mapInPandas to exercise the batched fan-out shape a real
    frame-decoder has (one input row → many output rows)."""

    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = (len(text) + frame_chars - 1) // frame_chars
                for i in range(0, n_frames, stride):
                    frame = text[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return src.mapInPandas(sample, schema=FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)


def audio_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    hop: int = 16,
    sample_rate: int = 16_000,
) -> DataFrame:
    """"Audio" chunking: overlapping hop windows over the sample stream —
    the standard feature-extraction shape (hop < window, unlike
    frame_sample's strided non-overlap). One "sample" = one char of the
    synthetic payload; a real deployment decodes PCM first (see
    ``decode_image_real`` for the gated-decoder pattern).

    Emits (chunk_idx, start_ms, n_samples, md5) per window; the final
    ragged tail window is kept (n_samples < window), matching what an STFT
    framer does with ``pad_mode=None``. mapInPandas: 1→N fan-out, narrow,
    Arrow-batched — at 100 TB the chunk stream partitions exactly like its
    parent scan.
    """
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, sizes, hashes = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                idx = 0
                for off in range(0, max(n, 1), hop):
                    piece = text[off : off + window]
                    if not piece:
                        break
                    ids.append(doc_id)
                    idxs.append(idx)
                    starts.append(off * 1000 // sample_rate)
                    sizes.append(len(piece))
                    hashes.append(hashlib.md5(piece.encode("utf-8")).hexdigest())
                    idx += 1
                    if off + window >= n:
                        break  # tail window consumed the rest
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_idx": idxs,
                    "start_ms": starts,
                    "n_samples": sizes,
                    "chunk_md5": hashes,
                }
            )

    return src.mapInPandas(chunk, schema=AUDIO_CHUNK_SCHEMA)


def frame_dedup(frames: DataFrame) -> DataFrame:
    """Cross-document frame-level exact dedup over a ``frame_sample``
    output: group identical frame fingerprints, keep the lexicographically
    first (doc_id, frame_idx) occurrence — the intro/outro/watermark/
    test-card detector of a video pipeline (a frame appearing across many
    videos is boilerplate, not content), and the visual analog of
    ``dedup.exact_dedup``. Returns one row per duplicated fingerprint:
    (frame_md5, n_occ, n_docs, keep_doc, keep_frame), n_occ >= 2.

    One hash-keyed shuffle with map-side combine, survivor picked as
    ``min(struct(doc_id, frame_idx))`` inside the same aggregation — no
    window, no second pass; output is duplicate-fingerprint-sized."""
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min(F.struct("doc_id", "frame_idx")).alias("__first__"),
        )
        .where(F.col("n_occ") >= 2)
        .select(
            "frame_md5",
            "n_occ",
            "n_docs",
            F.col("__first__.doc_id").cast("long").alias("keep_doc"),
            F.col("__first__.frame_idx").cast("long").alias("keep_frame"),
        )
    )


def decode_image_real(payload: bytes) -> tuple[int, int, str, str]:
    """Real image decode behind the optional PIL dependency: returns
    (width, height, format, mode). Raises ``NotImplementedError`` when no
    image library is installed (this container ships none by design) —
    callers fall back to ``image_meta``'s deterministic fake. Exercised by
    ``tests/test_multimodal_real.py`` wherever PIL is present
    (``pytest.importorskip``)."""
    try:
        import PIL.Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires an image library (not installed here); "
            "use image_meta() for the deterministic-fake pipeline"
        ) from exc
    import io

    with PIL.Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height, (img.format or ""), img.mode


def image_meta_real(docs_with_payload: DataFrame) -> DataFrame:
    """``image_meta`` with the REAL decoder: same schema, same Arrow
    plumbing, PIL in the batch loop. The checksum column carries the md5 of
    the payload (same as the fake path) so downstream dedup composes
    identically. Requires PIL on driver AND executors; import is checked
    eagerly at plan build so a missing library fails fast, not mid-job."""
    decode_image_real(_PROBE_PNG)  # fail fast if PIL is absent

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_real(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "fmt": [m[2] for m in metas],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "checksum": [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]],
                }
            )

    return docs_with_payload.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


IMAGE_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.LongType()),
        T.StructField("src_height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
        T.StructField("thumb_bytes", T.LongType()),
    ]
)


def image_resize(
    docs_with_payload: DataFrame, max_side: int = 64, real: bool = False
) -> DataFrame:
    """Thumbnail/resize stage of an image-curation pipeline: per payload,
    emit the aspect-preserving target dims (longest side = ``max_side``,
    never upscaled) plus the fingerprint and size of the resized output —
    the preprocessing step every multimodal training pipeline runs before
    feature extraction.

    ``real=True`` resizes with PIL (import probed eagerly at plan build —
    fail fast, not mid-job; this container ships no image lib by design).
    The default path is the DETERMINISTIC FAKE: source dims derive from
    the payload exactly like ``image_meta``'s fake decoder, and the
    "thumbnail" is a strided byte subsample of the payload — so the
    Spark-side plumbing (Arrow batches, 1→1 schema, narrow no-shuffle
    plan, dims arithmetic) is real and tested while the codec stays a
    clearly-marked seam, per the multimodal stubbing policy.

    Narrow mapInPandas: partitions exactly like the payload scan at any
    corpus size; output carries ~fingerprints, never pixel buffers."""
    if real:
        decode_image_real(_PROBE_PNG)  # fail fast if PIL is absent

    def fake_one(payload: bytes) -> tuple[int, int, int, int, str, int]:
        _, w, h, _ = _fake_decode_meta(payload)
        scale_den = max(w, h)
        if scale_den <= max_side:
            tw, th = w, h
        else:
            # floor-scaled, min 1 — integer arithmetic, engine-portable
            tw = max(1, w * max_side // scale_den)
            th = max(1, h * max_side // scale_den)
        stride = max(1, len(payload) // max(1, tw * th))
        thumb = payload[::stride]
        return w, h, tw, th, hashlib.md5(thumb).hexdigest(), len(thumb)

    def real_one(payload: bytes) -> tuple[int, int, int, int, str, int]:
        import io

        import PIL.Image  # type: ignore

        with PIL.Image.open(io.BytesIO(payload)) as img:
            w, h = img.width, img.height
            img.thumbnail((max_side, max_side))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            return w, h, img.width, img.height, hashlib.md5(data).hexdigest(), len(data)

    one = real_one if real else fake_one

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "src_width": [r[0] for r in rows],
                    "src_height": [r[1] for r in rows],
                    "width": [r[2] for r in rows],
                    "height": [r[3] for r in rows],
                    "thumb_md5": [r[4] for r in rows],
                    "thumb_bytes": [r[5] for r in rows],
                }
            )

    return docs_with_payload.mapInPandas(resize, schema=IMAGE_RESIZE_SCHEMA)


def _make_probe_png() -> bytes:
    """Build a valid 1x1 RGB PNG (probe for the fail-fast decode check and
    a fixture for the real-decoder tests — no image lib needed to WRITE it)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)  # 1x1, 8-bit RGB
    idat = zlib.compress(b"\x00\xff\x00\x00")  # filter 0 + one red pixel
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


_PROBE_PNG = _make_probe_png()


# ---------------------------------------------------------------------------
# perceptual average-hash (the real algorithm; decode stays the gated seam)
# ---------------------------------------------------------------------------

#: int64 two's-complement value of bit 63 — written as arithmetic because
#: neither Spark SQL nor DuckDB parses the most-negative literal directly
_BIT63 = "(-9223372036854775807L - 1L)"


def average_hash_py(values, cells: int = 64) -> int:
    """Reference average-hash (aHash) over a pixel/value stream: position
    ``i`` belongs to block ``(i * cells) DIV n`` (the inverse block map —
    blocks are contiguous, partition the stream, and reduce to the
    identity when n == cells); set bit j iff block j's mean exceeds the
    global mean (strict, integer cross-multiplied — no division,
    engine-exact), pack with bit 63 two's-complement into int64.  THE
    algorithm of perceptual-hash folklore ("aHash"; cf. pHash.org /
    imagehash) — on a decoded 8x8 grayscale image each cell is one pixel
    and this IS the canonical 64-bit aHash.  This single function is the
    parity oracle for the distributed column form (``with_average_hash``)
    and the packing step of the real PIL path (``average_hash_real``)."""
    n = len(values)
    if n == 0:
        return 0
    tsum = sum(values)
    csum = [0] * cells
    ccnt = [0] * cells
    for i, v in enumerate(values):
        j = (i * cells) // n
        csum[j] += v
        ccnt[j] += 1
    h = 0
    for j in range(cells):
        if ccnt[j] and csum[j] * n > tsum * ccnt[j]:
            h |= 1 << j
    return h - (1 << 64) if h >= 1 << 63 else h


def average_hash_expr(text_col: str = "frame") -> str:
    """Spark SQL for the 64-bit aHash of a string column's codepoints —
    rendered as ONE self-contained ``aggregate()`` whose INIT state
    carries the codepoint array and its total, so every sub-result is
    computed exactly once per row NO MATTER how the optimizer inlines
    the expression into consumers.  (The original three-``withColumn``
    form was semantically identical but let CollapseProject inline the
    64-cell transform into each downstream reference — measured 60x
    wall on the band self-join because the inlined copy re-evaluated
    inside fold lambdas.  A single expression has no cross-projection
    references to duplicate; total work is O(n + 64) per row even if a
    consumer embeds the whole expression several times.)

    Cell j covers 1-based positions [(j*n+63) DIV 64 + 1,
    ((j+1)*n+63) DIV 64] — the inverse image of ``average_hash_py``'s
    (i*64) DIV n block map; the ranges partition 1..n."""
    L = f"length({text_col})"
    cps = (
        f"transform(sequence(1, greatest({L}, 1)), "
        f"p -> CASE WHEN p <= {L} "
        f"THEN CAST(ascii(substr({text_col}, p, 1)) AS BIGINT) "
        "ELSE 0L END)"
    )
    lo = "(j * size(acc.cp) + 63) DIV 64 + 1"
    hi = "((j + 1) * size(acc.cp) + 63) DIV 64"
    # empty strings degrade to a single zero "pixel": every cell sum is
    # 0, the strict > never fires, hash = 0 == average_hash_py([])
    return (
        "aggregate(sequence(0, 63), "
        f"named_struct('cp', {cps}, "
        f"'t', aggregate({cps}, 0L, (a, x) -> a + x), 'h', 0L), "
        "(acc, j) -> named_struct('cp', acc.cp, 't', acc.t, 'h', acc.h + "
        f"CASE WHEN aggregate(slice(acc.cp, CAST({lo} AS INT), "
        f"CAST(greatest({hi} - ({lo}) + 1, 0) AS INT)), 0L, (a, x) -> a + x) "
        f"* size(acc.cp) > acc.t * greatest({hi} - ({lo}) + 1, 0) "
        f"THEN CASE WHEN j = 63 THEN {_BIT63} ELSE shiftleft(1L, j) END "
        "ELSE 0L END), "
        "acc -> acc.h)"
    )


def with_average_hash(
    frames: DataFrame, text_col: str = "frame", out_col: str = "phash"
) -> DataFrame:
    """Distributed aHash as pure column algebra over a string column whose
    CODEPOINTS stand in for the pixel stream (the deterministic-fake
    decode of this module's stubbing policy: the hash algorithm is real,
    only the codec is faked — swap ``average_hash_real`` in where PIL
    exists and everything downstream is unchanged).

    One narrow projection, zero Python, zero shuffles — see
    ``average_hash_expr`` for the single-expression discipline and the
    O(n + 64) per-row bound; the strict cross-multiplied comparison and
    two's-complement bit 63 exactly as ``average_hash_py``.  Fuzz-pinned
    against it in tests/test_round10_ops.py; the DuckDB oracle
    reproduces it via an explode + groupBy of the same integer
    arithmetic."""
    return frames.withColumn(out_col, F.expr(average_hash_expr(text_col)))


def average_hash_real(
    docs_with_payload: DataFrame, hash_size: int = 8
) -> DataFrame:
    """Canonical 64-bit perceptual aHash with the REAL decoder: PIL decode
    -> grayscale -> ``hash_size`` x ``hash_size`` resize -> threshold at
    the mean (``average_hash_py`` on the 64 resized pixels — each cell is
    exactly one pixel).  Import probed eagerly at plan build (fail fast,
    not mid-job; the ``image_meta_real`` pattern).  Arrow-batched 1->1
    mapInPandas: partitions exactly like the payload scan; the output
    (doc_id, frame_idx, phash) feeds the SAME ``phash_near_dup`` /
    ``scene_cuts`` plumbing as the fake path — ``frame_idx`` is threaded
    through from the input when present, else emitted as 0 (a
    one-frame-per-doc image corpus).  Exercised by
    tests/test_multimodal_real.py wherever PIL is installed."""
    decode_image_real(_PROBE_PNG)  # fail fast if PIL is absent

    has_frame_idx = "frame_idx" in docs_with_payload.columns
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import PIL.Image  # type: ignore

        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                with PIL.Image.open(io.BytesIO(bytes(p))) as img:
                    px = list(
                        img.convert("L")
                        .resize((hash_size, hash_size))
                        .getdata()
                    )
                hashes.append(average_hash_py(px, cells=hash_size * hash_size))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "frame_idx": pdf["frame_idx"].values
                    if has_frame_idx
                    else [0] * len(pdf),
                    "phash": hashes,
                }
            )

    return docs_with_payload.mapInPandas(hash_batch, schema=schema)


def phash_near_dup(
    hashed: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Visual near-dup pairs at Hamming <= ``max_hamming`` over a
    (doc_id, frame_idx, phash) table — the image/video analog of
    MinHash-LSH dedup, via multi-index Hamming banding (the Hamming-ball
    multiprobe family of operators/similarity.py applied bandwise):
    split the 64-bit hash into ``bands`` equal slices; by pigeonhole any
    pair within ``max_hamming < bands`` bits must agree EXACTLY on at
    least one slice, so an equi-join on (band, slice value) finds every
    qualifying pair and the exact ``bit_count(xor)`` verify prunes the
    rest.  NEVER all-pairs: the join is keyed on 16-bit band values
    (65k buckets per band at the default), candidates are
    band-collision-bounded, and multi-band double-hits dedupe in the
    same distinct as the pair canonicalization.

    Returns (doc_a, frame_a, doc_b, frame_b, hamming), pair-ordered
    (doc, frame) lexicographically."""
    if max_hamming >= bands:
        raise ValueError(
            f"banding guarantees recall only for max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    if 64 % bands:
        raise ValueError(f"bands must divide 64 (got {bands})")
    width = 64 // bands
    mask = (1 << width) - 1
    # the band array is UNROLLED (not a transform lambda): with `phash`
    # referenced once inside a lambda, CollapseProject treats the whole
    # upstream hash expression as single-use and inlines it — re-evaluated
    # once per band at runtime; bands+1 syntactic references trip the
    # optimizer's multi-reference guard so the hash stays one projection
    unrolled = ", ".join(
        f"named_struct('band', {b}, "
        f"'val', shiftright(phash, {b * width}) & {mask}L)"
        for b in range(bands)
    )
    banded = hashed.select(
        F.col("doc_id"),
        F.col("frame_idx"),
        F.col("phash"),
        F.explode(F.expr(f"array({unrolled})")).alias("bv"),
    ).select("doc_id", "frame_idx", "phash", "bv.band", "bv.val")
    # self-join as SortMergeJoin BY HINT, not AQE's broadcast: the two
    # sides are the SAME subplan, so shuffled sides become ONE exchange
    # (ReuseExchange) and the hash subtree evaluates once instead of
    # twice (measured 10.9s -> 4.9s at sf0.1); a broadcast side can
    # never reuse the stream side, and at corpus scale the build side
    # is the corpus itself — never broadcastable anyway. SMJ over SHJ
    # for skew robustness: degenerate hashes (short frames) cluster in
    # a few band buckets, and AQE's skew-join splitting covers SMJ.
    a, b = banded.alias("a"), banded.hint("merge").alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.val") == F.col("b.val"))
        & (
            F.struct(F.col("a.doc_id"), F.col("a.frame_idx"))
            < F.struct(F.col("b.doc_id"), F.col("b.frame_idx"))
        ),
    )
    dist = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    ).cast("long")
    return (
        cand.where(dist <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.frame_idx").alias("frame_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.frame_idx").alias("frame_b"),
            dist.alias("hamming"),
        )
        .distinct()
    )


def scene_cuts(frames: DataFrame, cut_hamming: int = 20) -> DataFrame:
    """Scene-cut detection over sampled frame fingerprints (the output of
    ``frame_sample``): derive a 60-bit signature per frame from its md5,
    mark a cut wherever the Hamming distance to the PREVIOUS kept frame
    is >= ``cut_hamming`` (identical/near-identical frames hash close to
    0 apart only when equal — md5 is not locality-sensitive, so this is
    the exact-change detector appropriate for fingerprints; a real
    perceptual pipeline would swap in a pHash signature with the same
    plumbing), and number scenes per video with a running sum of cuts.

    Pure column algebra over the frame stream: one keyed lag window +
    one keyed running sum (both partitioned by doc), no Python — the
    shot-segmentation step a video curation pipeline runs after frame
    decode, at any corpus size. Returns (doc_id, frame_idx, hamming_prev,
    is_cut, scene_id)."""
    sig = F.conv(F.substring("frame_md5", 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    with_sig = frames.withColumn("__sig__", sig).withColumn(
        "__prev__", F.lag("__sig__").over(w)
    )
    dist = F.bit_count(F.col("__sig__").bitwiseXOR(F.col("__prev__")))
    flagged = with_sig.select(
        "doc_id",
        "frame_idx",
        F.coalesce(dist, F.lit(-1)).cast("long").alias("hamming_prev"),
        (F.col("__prev__").isNull() | (dist >= cut_hamming)).alias("is_cut"),
    )
    scene = F.sum(F.col("is_cut").cast("long")).over(
        Window.partitionBy("doc_id").orderBy("frame_idx").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return flagged.withColumn("scene_id", (scene - 1).cast("long"))
