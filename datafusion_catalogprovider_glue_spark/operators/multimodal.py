"""Multimodal column handling (SURVEY.md §2-D5).

Image/audio/video payloads are opaque ``binary`` columns wrapped in a
struct with typed metadata — the standard lakehouse layout for
multimodal training data.  The decode/resize/frame-sample stages run
REAL codecs (pure-numpy netpbm P6/P5 and RIFF/WAVE PCM16 —
functions/media_codecs.py) over deterministically generated media
fixtures, so the oracle can recompute every pixel/sample from the
generation formula while the Spark side parses actual format bytes.
A JPEG/FLAC payload needs only a new codec in media_codecs; the
operator dataflow is format-agnostic.

100 TB notes: payload bytes travel executor→Python as Arrow batches
(zero-copy columnar), never through the driver; per-batch work is
pure pandas/numpy; output schemas are declared up front so Catalyst
can plan around the UDF.  ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds peak memory when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.functions.media_codecs import (
    decode_ppm,
    decode_ppm_frames,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    resize_nearest,
)
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

FRAMES_PER_DOC = 4
FRAME_STRIDE = 2  # frame-sample keeps every 2nd frame
IMG_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/wav"
VID_MIME = "video/x-netpbm-frames"
WAV_RATE = 16000


def _docs_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-packed as a multimodal record:
    media struct<bytes: binary, meta: struct<mime, n_bytes>>."""
    apply_engine_conf(spark)
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        "text",
        F.struct(
            payload.alias("bytes"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.length(payload).cast("long").alias("n_bytes"),
            ).alias("meta"),
        ).alias("media"),
    )


# Deterministic media generation, a pure function of doc_id — the SQL
# oracle re-derives pixels/samples from these same formulas while the
# Spark side decodes the actual PPM/WAV bytes:
#   image:  w = 8 + id%16, h = 6 + id%12, pixel(i) = (id*31 + i) % 256
#   audio:  n = 160 + id%80 samples, s(i) = ((id*7 + i*13) % 2048) - 1024
#   video:  FRAMES_PER_DOC concatenated P6 frames,
#           frame k pixel(i) = (id*31 + k*17 + i) % 256


def _img_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 16, 6 + doc_id % 12


def _make_image(doc_id: int, k: int = 0) -> bytes:
    w, h = _img_dims(doc_id)
    raster = ((doc_id * 31 + k * 17 + np.arange(w * h * 3)) % 256).astype(
        np.uint8
    )
    return encode_ppm(raster.reshape(h, w, 3))


def _make_audio(doc_id: int) -> bytes:
    n = 160 + doc_id % 80
    samples = ((doc_id * 7 + np.arange(n) * 13) % 2048 - 1024).astype("<i2")
    return encode_wav_pcm16(samples, WAV_RATE)


def _docs_media_real(
    spark: SparkSession, sf_dir: str, kind: str
) -> DataFrame:
    """Documents re-materialized as real media records
    (struct<bytes: binary, meta: struct<mime, n_bytes>>), generated
    executor-side per batch — the corpus never touches the driver.
    ``kind``: 'mixed' (PPM images, every 4th doc a WAV), 'image'
    (all PPM), 'video' (concatenated P6 frame streams)."""
    apply_engine_conf(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if kind == "video":
                    payload = b"".join(
                        _make_image(doc_id, k) for k in range(FRAMES_PER_DOC)
                    )
                    mime = VID_MIME
                elif kind == "audio" or (kind == "mixed" and doc_id % 4 == 3):
                    payload, mime = _make_audio(doc_id), WAV_MIME
                else:
                    payload, mime = _make_image(doc_id), IMG_MIME
                rows.append((doc_id, payload, mime, len(payload)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "bytes", "mime", "n_bytes"]
            )

    flat = d.mapInPandas(
        gen, "doc_id long, bytes binary, mime string, n_bytes long"
    )
    return flat.select(
        "doc_id",
        F.struct(
            F.col("bytes"),
            F.struct(F.col("mime"), F.col("n_bytes")).alias("meta"),
        ).alias("media"),
    )


@query(
    "multimodal_pack",
    oracle="""
    SELECT doc_id,
           'application/octet-stream' AS mime,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte
    FROM documents
    """,
)
def multimodal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 schema plumbing: pack → struct-field access back out.  The
    binary payload column itself never leaves the JVM."""
    m = _docs_as_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("media.meta.mime").alias("mime"),
        F.col("media.meta.n_bytes").alias("n_bytes"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("first_byte"),
    )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 3 THEN 'audio/wav'
                ELSE 'image/x-portable-pixmap' END AS mime,
           CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE CAST(8 + doc_id % 16 AS BIGINT) END AS width,
           CASE WHEN doc_id % 4 = 3 THEN NULL
                ELSE CAST(6 + doc_id % 12 AS BIGINT) END AS height,
           CASE WHEN doc_id % 4 = 3 THEN CAST(160 + doc_id % 80 AS BIGINT)
                ELSE NULL END AS n_samples,
           CASE WHEN doc_id % 4 = 3 THEN CAST(16000 AS BIGINT)
                ELSE NULL END AS sample_rate,
           CAST(CASE WHEN doc_id % 4 = 3
                THEN list_sum(list_transform(range(160 + doc_id % 80),
                              i -> ((doc_id*7 + i*13) % 2048) - 1024))
                ELSE list_sum(list_transform(
                              range((8 + doc_id % 16) * (6 + doc_id % 12) * 3),
                              i -> (doc_id*31 + i) % 256))
           END AS BIGINT) AS checksum
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 decode stage, REAL two-format codec dispatch: Arrow-batched
    ``mapInPandas`` parses each payload's actual bytes — netpbm P6
    header+raster for images, RIFF/WAVE chunk walk for audio
    (functions/media_codecs.py) — and emits the decoded dimensions /
    sample counts plus a full-raster checksum.  The SQL oracle
    re-derives every pixel and sample from the generation formula, so
    a hash match proves byte-exact encode→decode round trips for both
    formats, not just plumbing."""
    m = _docs_media_real(spark, sf_dir, "mixed").select("doc_id", "media")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                payload, mime = bytes(rec["bytes"]), rec["meta"]["mime"]
                if mime == WAV_MIME:
                    rate, s = decode_wav_pcm16(payload)
                    rows.append(
                        (int(doc_id), mime, None, None, int(s.size), rate,
                         int(s.sum(dtype=np.int64)))
                    )
                else:
                    arr, _ = decode_ppm(payload)
                    h, w = arr.shape[:2]
                    rows.append(
                        (int(doc_id), mime, w, h, None, None,
                         int(arr.sum(dtype=np.int64)))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "width", "height", "n_samples",
                         "sample_rate", "checksum"],
            )

    return m.mapInPandas(
        decode_batches,
        "doc_id bigint, mime string, width bigint, height bigint, "
        "n_samples bigint, sample_rate bigint, checksum bigint",
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h
      FROM documents
    ), f AS (
      SELECT doc_id, w, h, UNNEST(range({FRAMES_PER_DOC})) AS k FROM p
    )
    SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(list_sum(list_transform(range(w*h*3),
                i -> (doc_id*31 + k*17 + i) % 256)) AS BIGINT) AS frame_sum
    FROM f WHERE k % {FRAME_STRIDE} = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 frame sampling over a REAL frame stream: each payload is
    {FRAMES_PER_DOC} concatenated P6 images (the raw-video layout);
    the decoder walks the stream frame by frame, keeps every
    {FRAME_STRIDE}nd frame, and one input record fans out to N output
    rows inside ``mapInPandas`` (the batch-shape change a video
    sampler needs).  Per-frame raster sums are recomputed by the
    oracle from the generation formula — a hash match proves the
    stream splitting found exact frame boundaries."""
    m = _docs_media_real(spark, sf_dir, "video").select("doc_id", "media")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                frames = decode_ppm_frames(bytes(rec["bytes"]))
                for k in range(0, len(frames), FRAME_STRIDE):
                    arr = frames[k]
                    rows.append(
                        (int(doc_id), k, arr.shape[1], arr.shape[0],
                         int(arr.sum(dtype=np.int64)))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height", "frame_sum"],
            )

    return m.mapInPandas(
        sample_frames,
        "doc_id bigint, frame_idx bigint, width bigint, height bigint, "
        "frame_sum bigint",
    )


RESIZE_W, RESIZE_H = 16, 16  # thumbnail shape (oracle re-derives all pixels)


@query(
    "multimodal_resize",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h
      FROM documents
    ), r AS (
      SELECT doc_id, w, h,
             CAST(list_sum(flatten(list_transform(range({RESIZE_H}), y ->
                  flatten(list_transform(range({RESIZE_W}), x ->
                    list_transform(range(3), c ->
                      (doc_id*31
                       + (((y*h)//{RESIZE_H})*w + ((x*w)//{RESIZE_W}))*3 + c)
                      % 256))))))
                  AS BIGINT) AS checksum
      FROM p
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS src_w, CAST(h AS BIGINT) AS src_h,
           CAST({RESIZE_W} AS BIGINT) AS dst_w,
           CAST({RESIZE_H} AS BIGINT) AS dst_h,
           checksum,
           CAST(checksum AS DOUBLE) / {RESIZE_W * RESIZE_H * 3} AS mean_pixel
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 resize stage on REAL pixels: decode the P6 payload, apply a
    genuine nearest-neighbor resample (dst(y,x) = src(y*h//H, x*w//W)
    — numpy fancy indexing, the same kernel shape PIL's NEAREST
    uses), and emit the resized raster's checksum and mean.  One
    fused Arrow-batched ``mapInPandas`` pass so pixels never cross a
    stage boundary; the oracle recomputes every resized pixel from
    the generation formula + the same floor-index convention, so a
    hash match proves the resample touched exactly the right source
    pixels."""
    m = _docs_media_real(spark, sf_dir, "image").select("doc_id", "media")

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                arr, _ = decode_ppm(bytes(rec["bytes"]))
                h, w = arr.shape[:2]
                small = resize_nearest(arr, RESIZE_W, RESIZE_H)
                checksum = int(small.sum(dtype=np.int64))
                rows.append(
                    (int(doc_id), w, h, RESIZE_W, RESIZE_H, checksum,
                     float(checksum) / (RESIZE_W * RESIZE_H * 3))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "src_w", "src_h", "dst_w", "dst_h",
                         "checksum", "mean_pixel"],
            )

    return m.mapInPandas(
        resize_batches,
        "doc_id bigint, src_w bigint, src_h bigint, dst_w bigint, "
        "dst_h bigint, checksum bigint, mean_pixel double",
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           length(text) AS n_bytes,
           length(text) - length(replace(text, ' ', '')) AS n_space,
           CAST(list_sum(list_transform(string_split(text, ''),
                                        c -> ascii(c))) AS DOUBLE)
               / length(text) AS mean_byte
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 feature extraction — and unlike the decode/resize stages,
    this one is REAL, not stubbed: byte-level features (size,
    whitespace count, mean byte value) need numpy only, so the full
    Arrow path runs genuine computation end-to-end and the oracle
    recomputes the same features from the text the payload encodes.
    The numpy kernel (np.frombuffer → vectorized reduction) is exactly
    how a real featurizer consumes the payload column; swapping in a
    CLIP/mel-spectrogram embedding changes the kernel body, not the
    dataflow.  Zero shuffle: pure map stage, batch-bounded memory."""
    import numpy as np

    media = _docs_as_media(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = int(arr.size)
                feats.append(
                    (
                        doc_id,
                        n,
                        int((arr == 32).sum()),
                        # UNROUNDED int/int IEEE division: bit-identical
                        # on every engine.  (A 6-dp round here hit the
                        # numpy-half-even vs SQL-half-away tie on k/256
                        # grid values at sf0.1 — exact division has no
                        # tie to break.)
                        float(int(arr.sum(dtype=np.int64))) / n,
                    )
                )
            yield pd.DataFrame(
                feats, columns=["doc_id", "n_bytes", "n_space", "mean_byte"]
            )

    return media.select(
        "doc_id", F.col("media.bytes").alias("payload")
    ).mapInPandas(
        extract, "doc_id long, n_bytes long, n_space long, mean_byte double"
    )


AUDIO_WINDOW_BYTES = 400  # 25 ms of 16 kHz mono s8 — one STFT frame
AUDIO_HOP_BYTES = 160  # 10 ms hop


@query(
    "multimodal_audio_windows",
    oracle=f"""
    SELECT doc_id,
           CAST(s.start AS BIGINT) AS window_id,
           CAST(s.start * {AUDIO_HOP_BYTES} AS BIGINT) AS start_byte,
           CAST(LEAST({AUDIO_WINDOW_BYTES},
                      octet_length(encode(text)) - s.start * {AUDIO_HOP_BYTES})
                AS INT) AS n_bytes,
           md5(substring(text, s.start * {AUDIO_HOP_BYTES} + 1,
                         {AUDIO_WINDOW_BYTES})) AS window_md5
    FROM documents,
         UNNEST(generate_series(
             0, (octet_length(encode(text)) - 1) // {AUDIO_HOP_BYTES}
         )) AS s(start)
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 audio framing: slice each binary payload into overlapping
    fixed-size windows (400-byte window, 160-byte hop — the 25 ms/10 ms
    STFT framing every speech pipeline uses), all JVM-side: the window
    grid is a ``sequence`` explode and each slice is a binary
    ``substring`` — no Python in the loop, unlike the decode stages,
    because framing needs no codec.  Each window row carries its
    offset, actual length (tail windows run short) and an md5 of the
    slice bytes; the oracle recomputes the same windows from the text
    the payload encodes (ASCII corpus: byte slicing == char slicing).
    Zero shuffle — scan-stage generate+project, linear in corpus
    bytes; downstream FFT/mel kernels consume window rows, never whole
    payloads, which is what bounds executor memory at 100 TB."""
    media = _docs_as_media(spark, sf_dir)
    payload = F.col("media.bytes")
    grid = F.sequence(
        F.lit(0),
        F.floor((F.length(payload) - 1) / AUDIO_HOP_BYTES).cast("int"),
    )
    win = F.expr(
        f"substring(media.bytes, start * {AUDIO_HOP_BYTES} + 1, {AUDIO_WINDOW_BYTES})"
    )
    return (
        media.select("doc_id", "media", F.explode(grid).alias("start"))
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("window_id"),
            (F.col("start") * AUDIO_HOP_BYTES).cast("bigint").alias("start_byte"),
            F.least(
                F.lit(AUDIO_WINDOW_BYTES),
                F.length(payload) - F.col("start") * AUDIO_HOP_BYTES,
            )
            .cast("int")
            .alias("n_bytes"),
            F.md5(win).alias("window_md5"),
        )
    )


@query(
    "multimodal_tar_index",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, text, strlen(text) AS n_bytes,
             'doc_' || doc_id || '.txt' AS member,
             512 + CAST(ceil(strlen(text) / 512.0) AS BIGINT) * 512
               AS entry_bytes
      FROM documents
    )
    SELECT member,
           CAST(COALESCE(SUM(entry_bytes) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS offset_bytes,
           CAST(n_bytes AS BIGINT) AS size_bytes,
           md5(text) AS content_md5
    FROM ordered
    """,
)
def multimodal_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5c: WebDataset-style tar-shard indexing — training pipelines
    ship multimodal samples as tar shards (one tar per task) and need a
    (member, offset, size) index for random access without re-reading
    the archive.  Fixture: the documents corpus packed once per sf into
    a USTAR tar (`doc_<id>.txt`, doc_id order).

    The Spark side REALLY parses the archive: `binaryFile` loads the
    shard, an Arrow-batched `mapInPandas` walks the tar in the executor
    (stdlib tarfile over an in-memory buffer), and emits per-member
    offset/size plus an md5 of the extracted payload.  The oracle
    recomputes the entire USTAR layout in pure SQL — offset(k) =
    Σ_{i<k} (512-byte header + ⌈size/512⌉ padded data blocks), a window
    cumsum — and md5 from the source text, so a hash match proves both
    the offset arithmetic AND byte-exact payload extraction.

    At 100 TB the unit of parallelism is the SHARD (WebDataset's
    contract: many ~1 GB tars, `binaryFile` lists them into one task
    each, every task indexes its own shard independently); within a
    shard the walk is sequential by format design — that is why shards
    exist.  One shard here → one task, documented, with the
    multi-shard path identical code.
    """
    import io
    import os
    import tarfile

    from datafusion_catalogprovider_glue_spark.fixtures.tar_shards import (
        build_documents_tar_shard,
    )

    apply_engine_conf(spark)
    base = build_documents_tar_shard(spark, sf_dir)

    out_schema = (
        "member string, offset_bytes long, size_bytes long, content_md5 string"
    )

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for info in tf:
                        payload = tf.extractfile(info).read()
                        rows.append(
                            (
                                info.name,
                                info.offset,
                                info.size,
                                hashlib.md5(payload).hexdigest(),
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "member",
                        "offset_bytes",
                        "size_bytes",
                        "content_md5",
                    ],
                )

    shards = spark.read.format("binaryFile").load(base)
    return shards.select("content").mapInPandas(_index, out_schema)


TAR_WRITE_SHARDS = 4
_TAR_RECORD = 10240  # tarfile RECORDSIZE: archives pad to 20-block records


@query(
    "multimodal_tar_write",
    oracle=f"""
    WITH m AS (
      SELECT doc_id % {TAR_WRITE_SHARDS} AS shard,
             strlen(text) AS nb,
             512 + CAST(ceil(strlen(text) / 512.0) AS BIGINT) * 512 AS eb
      FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(nb) AS BIGINT) AS payload_bytes,
           CAST(ceil((SUM(eb) + 1024) / {_TAR_RECORD}.0) AS BIGINT)
             * {_TAR_RECORD} AS archive_bytes
    FROM m GROUP BY shard
    """,
)
def multimodal_tar_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 sink side: DISTRIBUTED WebDataset shard writing — the
    counterpart of multimodal_tar_index's reader.  Docs are assigned
    to shards (doc_id mod N — the deterministic twin of WebDataset's
    round-robin), each shard's members are written doc_id-ordered into
    one USTAR tar ON THE EXECUTOR (stdlib tarfile, mtime=0 → the
    archive bytes are a pure function of the content), and the
    returned manifest carries per-shard member/payload/archive sizes
    measured from the FILES ACTUALLY WRITTEN.  The oracle predicts the
    same numbers from the USTAR layout formula (512-byte header +
    512-padded data per member + 1024 end-of-archive, record-aligned
    to {_TAR_RECORD}) — a hash match proves the distributed write
    produced byte-exactly the predicted archives.

    Scale shape: rows shuffle ONCE on the shard key and arrive sorted
    (repartition + sortWithinPartitions), each task streams its
    shard(s) to storage — the mapPartitions writer never buffers more
    than one member, and shard count scales freely.  Local /tmp here;
    production points the same writer at a mounted object store."""
    import io
    import os
    import tarfile

    apply_engine_conf(spark)
    out_dir = os.path.join(
        "/tmp",
        f"glue_spark_tarw_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    os.makedirs(out_dir, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", (F.col("doc_id") % TAR_WRITE_SHARDS).alias("shard"))
        .repartition(TAR_WRITE_SHARDS, "shard")
        .sortWithinPartitions("shard", "doc_id")
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive grouped by shard and doc_id-sorted; stream each
        # shard's members straight into its archive
        tf = None
        cur = None
        counts: list[tuple[int, int, int, int]] = []
        n = payload = 0

        def _close():
            nonlocal tf, n, payload
            if tf is not None:
                tf.close()
                final = os.path.join(out_dir, f"shard-{cur:05d}.tar")
                os.replace(final + ".tmp", final)
                counts.append((cur, n, payload, os.path.getsize(final)))
                tf, n, payload = None, 0, 0

        for pdf in batches:
            for doc_id, text, shard in zip(
                pdf["doc_id"], pdf["text"], pdf["shard"]
            ):
                shard = int(shard)
                if shard != cur:
                    _close()
                    cur = shard
                    tf = tarfile.open(
                        os.path.join(out_dir, f"shard-{cur:05d}.tar.tmp"),
                        "w",
                        format=tarfile.USTAR_FORMAT,
                    )
                data = str(text).encode("utf-8")
                info = tarfile.TarInfo(name=f"doc_{int(doc_id)}.txt")
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
                n += 1
                payload += len(data)
        _close()
        yield pd.DataFrame(
            counts,
            columns=["shard", "n_members", "payload_bytes", "archive_bytes"],
        )

    return docs.mapInPandas(
        _write,
        "shard long, n_members long, payload_bytes long, archive_bytes long",
    )


@query(
    "multimodal_channel_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h
      FROM documents
    ), f AS (
      SELECT doc_id, w, h, UNNEST(range(3)) AS c FROM p
    )
    SELECT doc_id, CAST(c AS INT) AS channel,
           CAST(list_sum(list_transform(range(w*h),
                i -> (doc_id*31 + 3*i + c) % 256)) AS BIGINT) AS ch_sum,
           CAST(list_sum(list_transform(range(w*h),
                i -> (doc_id*31 + 3*i + c) % 256)) AS DOUBLE)
             / (w * h) AS ch_mean
    FROM f
    """,
)
def multimodal_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-CHANNEL statistics from REAL decoded pixels (the
    normalization constants a vision preprocessor computes): decode
    the P6 payload, slice the (h, w, 3) raster per channel with numpy
    strides, and emit each channel's sum and mean.  The oracle
    re-derives the strided slice from the generation formula — pixel
    (i, c) = (id·31 + 3i + c) mod 256 — so a hash match proves the
    decode AND the channel-axis reshape, not just total sums
    (a transposed or interleave-confused decode would pass a total
    checksum but fail per-channel)."""
    m = _docs_media_real(spark, sf_dir, "image").select("doc_id", "media")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                arr, _ = decode_ppm(bytes(rec["bytes"]))
                h, w = arr.shape[:2]
                for c in range(3):
                    ch = arr[:, :, c]
                    ch_sum = int(ch.sum(dtype=np.int64))
                    rows.append(
                        (int(doc_id), c, ch_sum, float(ch_sum) / (w * h))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "channel", "ch_sum", "ch_mean"]
            )

    return m.mapInPandas(
        stats, "doc_id bigint, channel int, ch_sum bigint, ch_mean double"
    )


AUDIO_FRAME = 64   # samples per analysis frame
AUDIO_HOP = 32     # hop (50% overlap)


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, 160 + doc_id % 80 AS n FROM documents
    ), f AS (
      SELECT doc_id, n,
             UNNEST(range((n - {AUDIO_FRAME}) // {AUDIO_HOP} + 1)) AS w
      FROM p WHERE n >= {AUDIO_FRAME}
    )
    SELECT doc_id, CAST(w AS BIGINT) AS frame_idx,
           CAST(list_sum(list_transform(range({AUDIO_FRAME}), j ->
                CAST(((doc_id*7 + (w*{AUDIO_HOP} + j)*13) % 2048) - 1024
                     AS BIGINT)
                * CAST(((doc_id*7 + (w*{AUDIO_HOP} + j)*13) % 2048) - 1024
                       AS BIGINT)))
             AS BIGINT) AS energy
    FROM f
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame ENERGY from REAL decoded audio (the VAD / loudness
    feature every speech pipeline computes first): decode the
    RIFF/WAVE payload, frame the sample vector ({AUDIO_FRAME}-sample
    frames, {AUDIO_HOP}-sample hop — numpy stride tricks, the actual
    STFT framing kernel), and emit each complete frame's sum of
    squared samples.  All-integer arithmetic, so the oracle's
    formula-derived energies must match EXACTLY — a resampled,
    misaligned, or sign-flipped decode cannot pass."""
    m = _docs_media_real(spark, sf_dir, "audio").select("doc_id", "media")

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                _rate, samples = decode_wav_pcm16(bytes(rec["bytes"]))
                x = samples.astype(np.int64)
                n = x.size
                if n < AUDIO_FRAME:
                    continue
                n_frames = (n - AUDIO_FRAME) // AUDIO_HOP + 1
                idx = (
                    np.arange(AUDIO_FRAME)[None, :]
                    + AUDIO_HOP * np.arange(n_frames)[:, None]
                )
                frames = x[idx]
                for w, e in enumerate((frames * frames).sum(axis=1)):
                    rows.append((int(doc_id), w, int(e)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "energy"])

    return m.mapInPandas(
        energies, "doc_id bigint, frame_idx bigint, energy bigint"
    )


# --- image NEAR-DUP detection: average-hash over real decoded pixels ---
AHASH_W, AHASH_H = 10, 6   # 60 bits: positive bigint, 4 clean 15-bit bands
AHASH_BANDS = 4
AHASH_BAND_BITS = 15
AHASH_RADIUS = 6
_NEARDUP_GROUP = 5    # docs 5g..5g+4 render near-identical images
_NOISE_STRIDE = 101   # sparse low-amplitude per-doc pixel noise


def _make_near_dup_image(doc_id: int) -> bytes:
    """Group g = doc_id//5*5 renders ONE base raster; the other four
    docs add amplitude-(doc_id%5) noise on every 101st channel — the
    imperceptible-perturbation near-duplicate class (re-encodes,
    steganographic noise, single-pixel watermarks)."""
    g = doc_id - doc_id % _NEARDUP_GROUP
    w, h = _img_dims(g)
    i = np.arange(w * h * 3, dtype=np.int64)
    noise = np.where(i % _NOISE_STRIDE == 0, doc_id % _NEARDUP_GROUP, 0)
    raster = ((g * 31 + i + noise) % 256).astype(np.uint8)
    return encode_ppm(raster.reshape(h, w, 3))


def _ahash_oracle() -> str:
    W, H, G, NS = AHASH_W, AHASH_H, _NEARDUP_GROUP, _NOISE_STRIDE
    flat3c = (
        f"(((((k // {W}) * h) // {H}) * w + (((k % {W}) * w) // {W})) * 3 + c)"
    )
    luma = (
        f"list_sum(list_transform(range(3), c -> "
        f"(g * 31 + {flat3c} + CASE WHEN {flat3c} % {NS} = 0 "
        f"THEN doc_id % {G} ELSE 0 END) % 256))"
    )
    n_cells = W * H
    return f"""
    WITH dims AS (
        SELECT doc_id, doc_id - doc_id % {G} AS g,
               8 + (doc_id - doc_id % {G}) % 16 AS w,
               6 + (doc_id - doc_id % {G}) % 12 AS h
        FROM documents
    ),
    lum AS (
        SELECT doc_id,
               list_transform(range({n_cells}), k -> {luma}) AS lumas
        FROM dims
    ),
    hh AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range({n_cells}), k ->
                   CASE WHEN lumas[k + 1] * {n_cells} > list_sum(lumas)
                        THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
                   AS ahash
        FROM lum
    ),
    bands AS (
        SELECT doc_id, ahash, b,
               (ahash >> ({AHASH_BAND_BITS} * b)) & {(1 << AHASH_BAND_BITS) - 1}
                   AS bval
        FROM hh, (SELECT UNNEST(range({AHASH_BANDS})) AS b)
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
               x.ahash AS ha, y.ahash AS hb
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.bval = y.bval AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {AHASH_RADIUS}
    """


@query("multimodal_image_dedup_ahash", oracle=_ahash_oracle())
def multimodal_image_dedup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate detection — the pHash-family pipeline over
    REAL pixels, fully value-checked: decode the P6 payload, 10x6
    nearest-neighbor downsample (the resize kernel multimodal_resize
    pins), integer luma (r+g+b), AVERAGE-HASH bits (cell luma x 60 >
    raster total — exact integer comparison, no float means), then
    the dedup_simhash pairing machinery: 4 x 15-bit band equi-join +
    bit_count(xor) <= radius.  Every quantity is integer arithmetic,
    so the DuckDB oracle re-derives hashes from the generation
    formula and the pair set hash-matches — a wrong decode, resample
    convention, or band slice shows up as a mismatch.

    At 100 TB: hashing is one Arrow-batched mapInPandas pass (60
    sampled pixels per image regardless of resolution — decode cost
    dominates, embarrassingly parallel); candidate generation is the
    banded LSH equi-join, never all-pairs; the radius check touches
    only banded candidates.  The noise model (amplitude <= 4 on every
    101st channel) is the imperceptible-perturbation class: pinned in
    tests, within-group recall stays high because at most ~2 sampled
    cells are perturbed."""
    apply_engine_conf(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datafusion_catalogprovider_glue_spark.functions.media_codecs import (
            decode_ppm,
            resize_nearest,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                arr, _ = decode_ppm(_make_near_dup_image(doc_id))
                small = resize_nearest(arr, AHASH_W, AHASH_H)
                lumas = small.astype(np.int64).sum(axis=2).reshape(-1)
                total = int(lumas.sum())
                hval = 0
                for k, v in enumerate(lumas):
                    if int(v) * (AHASH_W * AHASH_H) > total:
                        hval |= 1 << k
                rows.append((doc_id, hval))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    hashes = d.mapInPandas(
        hash_batches, "doc_id long, ahash long"
    ).localCheckpoint()  # index build: 8 bytes per image
    mask = (1 << AHASH_BAND_BITS) - 1
    bands = hashes.select(
        "doc_id",
        "ahash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("ahash", AHASH_BAND_BITS * b).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(AHASH_BANDS)
                ]
            )
        ).alias("b", "bval"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.ahash").alias("ha"),
            F.col("y.ahash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= AHASH_RADIUS)
        .select("doc_a", "doc_b", "hamming")
    )


AUDIO_DECIMATE = 4  # 4:1 decimation after the anti-alias prefilter


@query(
    "multimodal_audio_downsample",
    # the boxcar prefilter + pick-every-Nth pipeline is all-integer
    # (floor division by the window size), so the oracle re-derives
    # every output sample from the generation formula — a misaligned
    # window or an off-by-one phase cannot hash-match
    oracle=f"""
    WITH p AS (
      SELECT doc_id, 160 + doc_id % 80 AS n FROM documents
    ), o AS (
      SELECT doc_id, n, UNNEST(range(n // {AUDIO_DECIMATE})) AS k
      FROM p
    )
    SELECT doc_id, CAST(k AS BIGINT) AS out_idx,
           -- FLOOR, not DuckDB's // (which truncates toward zero and
           -- disagrees with numpy's floor division on negative sums);
           -- block sums are < 2^13 so the double divide is exact
           CAST(FLOOR(
             CAST(list_sum(list_transform(range({AUDIO_DECIMATE}), j ->
                  ((doc_id*7 + (k*{AUDIO_DECIMATE} + j)*13) % 2048) - 1024
             )) AS DOUBLE)
             / {AUDIO_DECIMATE}
           ) AS BIGINT) AS sample
    FROM o
    """,
)
def multimodal_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio DOWNSAMPLING from real decoded PCM16 (16 kHz -> 4 kHz
    style 4:1 decimation): a boxcar anti-alias prefilter (mean of each
    {AUDIO_DECIMATE}-sample block, floor division — all-integer) then
    pick-one-per-block, the standard cheap decimator a speech
    curation pipeline runs before feature extraction.  One input
    record fans out to n/{AUDIO_DECIMATE} output samples inside the
    same Arrow-batched ``mapInPandas`` shape as the other codecs —
    embarrassingly parallel, zero shuffles.  The trailing partial
    block is dropped (every output sample is a FULL block's mean), and
    block means use FLOOR division on negative sums (numpy's
    convention; the oracle spells it FLOOR() because DuckDB's //
    truncates toward zero — the integer-exact hash caught exactly that
    mismatch)."""
    m = _docs_media_real(spark, sf_dir, "audio").select("doc_id", "media")

    def downsample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                _rate, samples = decode_wav_pcm16(bytes(rec["bytes"]))
                x = samples.astype(np.int64)
                n_blocks = x.size // AUDIO_DECIMATE
                if n_blocks == 0:
                    continue
                blocks = x[: n_blocks * AUDIO_DECIMATE].reshape(
                    n_blocks, AUDIO_DECIMATE
                )
                means = blocks.sum(axis=1) // AUDIO_DECIMATE
                for k, s in enumerate(means):
                    rows.append((int(doc_id), k, int(s)))
            yield pd.DataFrame(rows, columns=["doc_id", "out_idx", "sample"])

    return m.mapInPandas(
        downsample, "doc_id bigint, out_idx bigint, sample bigint"
    )


HIST_BUCKETS = 8  # pixel-value histogram: 256 / 32 buckets


@query(
    "multimodal_image_histogram",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h
      FROM documents
    ), b AS (
      SELECT doc_id, w, h, UNNEST(range({HIST_BUCKETS})) AS bucket FROM p
    )
    SELECT doc_id, CAST(bucket AS INT) AS bucket,
           CAST(list_sum(list_transform(range(w*h*3), i ->
                CASE WHEN ((doc_id*31 + i) % 256) // 32 = bucket
                     THEN 1 ELSE 0 END)) AS BIGINT) AS n_pixels
    FROM b
    """,
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-intensity HISTOGRAM over real decoded rasters (the
    exposure/contrast feature an image-quality filter computes): decode
    the P6 payload, bucket every channel value into {HIST_BUCKETS}
    32-wide bins with one numpy bincount, emit (doc, bucket, count) —
    dense rows (zero buckets included) so downstream percentile math
    never special-cases missing bins.  All-integer counts; the oracle
    re-derives every bin from the generation formula, so a decoder
    that dropped a channel, clipped values, or mis-sized the raster
    cannot hash-match.  Same Arrow-batched mapInPandas codec shape:
    embarrassingly parallel, zero shuffles."""
    m = _docs_media_real(spark, sf_dir, "image").select("doc_id", "media")

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec in zip(pdf["doc_id"], pdf["media"]):
                arr, _mx = decode_ppm(bytes(rec["bytes"]))
                counts = np.bincount(
                    arr.reshape(-1) // 32, minlength=HIST_BUCKETS
                )
                for b in range(HIST_BUCKETS):
                    rows.append((int(doc_id), b, int(counts[b])))
            yield pd.DataFrame(rows, columns=["doc_id", "bucket", "n_pixels"])

    return m.mapInPandas(
        hist, "doc_id bigint, bucket int, n_pixels bigint"
    )
