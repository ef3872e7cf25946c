"""Multimodal column handling (SURVEY.md §2-D5).

Image/audio/video payloads are opaque ``binary`` columns wrapped in a
struct with typed metadata — the standard lakehouse layout for
multimodal training data.  The Spark-side plumbing (schema, struct
access, Arrow-batched ``mapInPandas`` with batch-shape changes) is
real and oracle-tested; the actual media decode is STUBBED with a
deterministic fake because no image/audio libraries ship in this
container (the ``_decode_media_real`` hook raises
``NotImplementedError`` and documents where PIL/ffmpeg would plug in).

100 TB notes: payload bytes travel executor→Python as Arrow batches
(zero-copy columnar), never through the driver; per-batch work is
pure pandas/numpy; output schemas are declared up front so Catalyst
can plan around the UDF.  ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds peak memory when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

FRAMES_PER_DOC = 3


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


def _decode_media_real(payload: bytes) -> dict:
    """Where a real decoder plugs in (PIL.Image.open / soundfile /
    pyav).  Not available in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in "
        "this environment; tests use the deterministic fake below"
    )


def _decode_media_fake(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a decoder: derives 'dimensions' and a
    'feature' from the byte length so the full pipeline is testable."""
    n = len(payload)
    return n % 640, (n * 7) % 480, round(n / 1000.0, 6)


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
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height,
           ROUND(octet_length(encode(text)) / 1000.0, 6) AS feature
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 decode stage: Arrow-batched ``mapInPandas`` over the packed
    records.  The decode itself is the deterministic fake (see module
    docstring) — but the batch transfer, struct unpacking in pandas,
    and declared output schema are exactly what a real image decode
    uses, and the oracle independently recomputes the fake from SQL,
    so the plumbing is value-checked end-to-end."""
    m = _docs_as_media(spark, sf_dir).select("doc_id", "media")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"].map(lambda rec: rec["bytes"])
            decoded = payloads.map(_decode_media_fake)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "feature": decoded.map(lambda t: t[2]),
                }
            )

    return m.mapInPandas(
        decode_batches, "doc_id bigint, width bigint, height bigint, feature double"
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, CAST(f.idx AS BIGINT) AS frame_idx,
           md5(text || '-' || f.idx) AS frame_hash
    FROM documents, (SELECT UNNEST(range({FRAMES_PER_DOC})) AS idx) f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 frame sampling: one input record fans out to N output rows
    inside ``mapInPandas`` (the batch-shape change a video
    frame-sampler needs).  Frame 'content' is a deterministic hash of
    (payload, frame index) standing in for the decoded frame."""
    m = _docs_as_media(spark, sf_dir).select("doc_id", "text")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for idx in range(FRAMES_PER_DOC):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_hash"].append(
                        hashlib.md5(f"{text}-{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return m.mapInPandas(
        sample_frames, "doc_id bigint, frame_idx bigint, frame_hash string"
    )


RESIZE_W, RESIZE_H = 224, 224  # the standard vision-model input shape


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text)) % 640 AS src_w,
           (octet_length(encode(text)) * 7) % 480 AS src_h,
           {RESIZE_W} AS dst_w,
           {RESIZE_H} AS dst_h,
           ROUND(CAST({RESIZE_W} AS DOUBLE) / GREATEST(octet_length(encode(text)) % 640, 1), 6)
             AS scale_x,
           md5(text || '-resized-{RESIZE_W}x{RESIZE_H}') AS content_hash
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 resize stage: decode → resize → re-encode as one Arrow-batched
    ``mapInPandas`` pass (the fused layout a real image pipeline uses so
    pixels never cross a stage boundary).  The resize itself is the
    deterministic fake (real: PIL ``Image.resize``); source dims come
    from the fake decode, the output carries the target shape, the
    scale factor, and a content hash standing in for re-encoded bytes —
    all recomputed independently by the SQL oracle."""
    m = _docs_as_media(spark, sf_dir).select("doc_id", "text", "media")

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"].map(lambda rec: rec["bytes"])
            decoded = payloads.map(_decode_media_fake)
            src_w = decoded.map(lambda t: t[0])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": src_w,
                    "src_h": decoded.map(lambda t: t[1]),
                    "dst_w": RESIZE_W,
                    "dst_h": RESIZE_H,
                    "scale_x": (RESIZE_W / src_w.clip(lower=1)).round(6),
                    "content_hash": pdf["text"].map(
                        lambda t: hashlib.md5(
                            f"{t}-resized-{RESIZE_W}x{RESIZE_H}".encode()
                        ).hexdigest()
                    ),
                }
            )

    return m.mapInPandas(
        resize_batches,
        "doc_id bigint, src_w bigint, src_h bigint, dst_w int, dst_h int, "
        "scale_x double, content_hash string",
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

    apply_engine_conf(spark)
    base = os.path.join(
        "/tmp",
        f"glue_spark_tar_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    shard = os.path.join(base, "shard-00000.tar")
    if not os.path.exists(shard):
        os.makedirs(base, exist_ok=True)
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .orderBy("doc_id")
            .collect()
        )
        tmp = shard + ".tmp"
        with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
            for r in docs:
                data = r.text.encode("utf-8")
                info = tarfile.TarInfo(name=f"doc_{r.doc_id}.txt")
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
        os.rename(tmp, shard)

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
