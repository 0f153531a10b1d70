"""Multimodal columns: opaque binary payloads + typed metadata (north star).

Design (SURVEY.md §7.3): image/audio/video payloads are ``BinaryType``
columns traveling next to typed metadata structs; decode/feature-extract
steps are Arrow-batched pandas functions via ``mapInPandas`` — the ONLY
place this engine runs Python on the data path, because byte-level media
decoding has no Column-expression form.

The media libraries (PIL/librosa/av) are not in this container, so the
decode kernels are STUBBED: ``decode_image_stub`` raises
NotImplementedError when asked for a real decode and otherwise computes a
deterministic fake feature (byte histogram) so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.

Scale notes:
- binary payloads make rows wide: ``spark.sql.files.maxPartitionBytes``
  governs scan parallelism, and ``repartition`` before mapInPandas keeps
  Arrow batches bounded (``spark.sql.execution.arrow.maxRecordsPerBatch``).
- metadata-only queries never touch the binary column — column pruning
  means the parquet reader skips those pages entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Metadata struct carried with every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("hist16", T.ArrayType(T.LongType())),
    ]
)


def documents_as_media(docs: DataFrame, fmt: str = "png") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload with
    metadata — the testdata stand-in for a real binary corpus (the real
    path is ``spark.read.format('binaryFile')`` or parquet with a binary
    column)."""
    payload = F.encode("text", "utf-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.octet_length(payload).cast("long").alias("size_bytes"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def read_binary_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """mm3 (SURVEY.md §7.3): REAL binary-corpus ingestion via Spark's
    built-in ``binaryFile`` source — (path, modificationTime, length,
    content) per file; ``pathGlobFilter`` narrows by extension without
    listing cost. This is the production entry for image/audio dirs; the
    ``documents_as_media`` adapter exists only for the parquet testdata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def binary_ingest_summary(df: DataFrame) -> DataFrame:
    """Deterministic per-file summary of a binaryFile scan: basename, size,
    and content md5 (mtime/absolute path excluded so results are stable
    across checkouts and engines)."""
    return df.select(
        F.substring_index("path", "/", -1).alias("file_name"),
        F.col("length").cast("long").alias("size_bytes"),
        F.md5(F.hex("content")).alias("content_md5"),
    )


def decode_image_stub(payload: bytes) -> None:
    """Placeholder for the real decoder (PIL not present in container)."""
    raise NotImplementedError(
        "real image decode requires PIL/libvips; container ships neither — "
        "extract_features uses the deterministic byte-histogram fake instead"
    )


def extract_features(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — deterministic byte-histogram fake standing in for a
    real decode+embed kernel. The iterator-of-batches shape is exactly
    what a real GPU/codec kernel wants (amortized setup per batch).

    Batch sizing is driven by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (set it before calling for memory-bounded kernels) — NOT by counting
    the input, which would add a full extra action on the data path."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype("int64")
                out.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        # raw mean, not rounded: byte sums are < 2^53 so
                        # the double is EXACT and engine-side rounding
                        # (F.round / SQL round) stays oracle-portable
                        float(arr.mean()) if arr.size else 0.0,
                        hist.tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "size_bytes", "byte_mean", "hist16"]
            )

    src = media.select(id_col, payload_col)
    return src.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Binary->binary resize kernel shape (mapInPandas, 1 row in -> 1 row
    out). The real decode+resample needs PIL/libvips (absent in this
    container), so the payload transform is a deterministic fake — bytes
    resampled by stride to exactly width*height — while the Spark-side
    contract (schema, Arrow batching, metadata update) is real and
    tested. Swap the inner function for a PIL kernel in production."""
    import numpy as np
    import pandas as pd

    target = width * height

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    resized = np.zeros(target, dtype=np.uint8)
                else:
                    idx = (np.arange(target) * arr.size // target) % arr.size
                    resized = arr[idx]
                out.append(
                    (int(doc_id), resized.tobytes(), width, height, int(target))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "payload", "width", "height", "size_bytes"]
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_size", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling kernel shape (mapInPandas, 1 row in -> N rows out):
    treat the payload as fixed-size frames and keep every ``every_n``-th —
    the row-expanding contract a real video decoder (av/ffmpeg, absent
    here) would fill in. Output volume is bounded by len/frame_bytes/
    every_n per row; the kernel yields per input batch so memory stays
    one Arrow batch regardless of expansion."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out.append((int(doc_id), fi, bytes(chunk), len(chunk)))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_bytes", "frame_size"]
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, FRAME_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — verifies column pruning: the plan must
    not read the payload column (check ReadSchema in explain)."""
    return media.groupBy(F.col("meta.format").alias("format")).agg(
        F.count("*").alias("n"),
        F.sum("meta.size_bytes").alias("total_bytes"),
    )


# --- perceptual-hash near-dup (image dedup shape) ----------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def phash16_table(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """pHash-shaped perceptual fingerprint over binary payloads: split the
    payload into 16 positional segments, bit i = (mean byte of segment i)
    > (mean byte of the whole payload). The real thing thresholds DCT
    coefficients of a decoded image against their median — same
    structure (positional energy vs global energy), deterministic fake
    because no codec ships in this container; the Arrow batching, binary
    column handling, and downstream banding are the production shape.

    Arithmetic is exact-integer sums followed by one double division, so
    an engine recomputing it from the same bytes (the mm6 oracle does,
    from the text the payload encodes) gets bit-identical hashes."""
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = arr.size
                if n == 0:
                    out.append((int(doc_id), 0))
                    continue
                seg = (np.arange(n) * 16) // n
                sums = np.bincount(seg, weights=arr, minlength=16)
                cnts = np.bincount(seg, minlength=16)
                total_mean = arr.sum() / n
                with np.errstate(invalid="ignore"):
                    means = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
                bits = (means > total_mean) & (cnts > 0)
                out.append((int(doc_id), int((bits.astype(np.int64) << np.arange(16)).sum())))
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return media.select(id_col, payload_col).mapInPandas(kernel, PHASH_SCHEMA)


def phash_near_duplicates(
    media: DataFrame,
    max_hamming: int = 1,
    bands: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual near-dup pairs via banded Hamming search — the image
    analog of SimHash dedup. 16 hash bits split into ``bands`` bands;
    candidates share at least one full band; verify = exact popcount on
    the XOR. Pigeonhole guarantee: hamming <= max_hamming flips at most
    max_hamming bands, so with bands > max_hamming every true pair
    collides somewhere — recall 1.0, no all-pairs join. Hashes are
    persisted (registered with ``caching``) because the band self-join
    reads them twice."""
    from pyspark.storagelevel import StorageLevel

    from martech_pipelines_spark import caching

    assert 16 % bands == 0 and bands > max_hamming
    width = 16 // bands
    mask = (1 << width) - 1
    ph = caching.register(
        phash16_table(media, id_col, payload_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    band_rows = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    (F.shiftright("phash", b * width) % (mask + 1)).alias("bv"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "phash", "bb.band", "bb.bv")
    left = band_rows.select(
        "band", "bv", F.col("doc_id").alias("id_a"), F.col("phash").alias("pa")
    )
    right = band_rows.select(
        "band", "bv", F.col("doc_id").alias("id_b"), F.col("phash").alias("pb")
    )
    cand = (
        left.join(right, ["band", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
        .distinct()
    )
    hamming = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
