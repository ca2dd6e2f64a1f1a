"""Multimodal-column queries: binary payloads + typed metadata +
stubbed decode plumbing (training-data-pipeline surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    decode_media,
    frame_sample,
    media_metadata,
    media_table_from_documents,
)
from .registry import query


@query(
    "mm_media_metadata",
    doc="""Metadata over opaque binary media WITHOUT decoding: size,
    checksum, kind — the pure-JVM filter surface for media curation
    (payload = utf-8 bytes of documents; kind cycles by id).""",
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       source
FROM documents
ORDER BY media_id
""",
)
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table_from_documents(spark.table("documents"))
    return media_metadata(media).orderBy("media_id")


@query(
    "mm_decode_features",
    # Local-parity since the r8 tokenizer rotation: multimodal keeps its
    # driver row via mm_media_metadata; text_bpe_merges takes the slot.
    driver=False,
    doc="""Arrow-batched decode/feature-extract via mapInPandas with the
    deterministic fake decoder (real decoders aren't in this
    environment; schema, batch shape, and partitioning are the real
    plumbing). The surrogate is md5-byte-derived, so the oracle
    re-derives every width/height/feature value in SQL from the same
    digest — full value-level parity through the Python UDF path
    (round(b/255, 6) verified identical across engines for all 256
    byte values). The feature vector is serialized to a fixed-precision
    CSV string here because the driver's pandas canonicalizer cannot
    sort/hash list cells; the typed array<double> form is the
    ``driver=False`` twin below.""",
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END AS kind,
       CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64
            AS INT) AS width,
       CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64
            AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       array_to_string(list_transform(generate_series(0, 7), i ->
           printf('%.6f',
               round(CAST(('0x' || substr(md5(text), 5 + 2 * i, 2))
                          AS INT) / 255.0, 6))), ',') AS features_csv
FROM documents
ORDER BY media_id
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table_from_documents(spark.table("documents"))
    decoded = decode_media(media, fake=True)
    return decoded.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_bytes",
        F.concat_ws(
            ",",
            F.transform("features", lambda x: F.format_string("%.6f", x)),
        ).alias("features_csv"),
    ).orderBy("media_id")


@query(
    "mm_decode_features_typed",
    driver=False,
    doc="""Typed array<double> form of mm_decode_features — the shape a
    downstream embedding consumer reads. Local-parity-only: the driver's
    canonicalizer cannot hash list cells, so the serialized twin above
    is the driver-tier representative.""",
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END AS kind,
       CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64
            AS INT) AS width,
       CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64
            AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       list_transform(generate_series(0, 7), i ->
           round(CAST(('0x' || substr(md5(text), 5 + 2 * i, 2)) AS INT)
                 / 255.0, 6)) AS features
FROM documents
ORDER BY media_id
""",
)
def mm_decode_features_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table_from_documents(spark.table("documents"))
    return decode_media(media, fake=True).orderBy("media_id")


@query(
    "mm_frame_sample",
    driver=False,
    doc="""Per-video frame sampling via mapInPandas (4 deterministic
    payload slices per video under the fake decoder) — the
    one-row-to-many-frames UDTF shape for video pipelines. Frames are
    digested to (md5, n_bytes) so the byte-level slicing through the
    Python path is value-checked against SQL (was rows-only in r2);
    payloads are ASCII by fixture contract, so the oracle's character
    offsets equal the operator's byte offsets.""",
    oracle="""
WITH vids AS (
    SELECT doc_id AS media_id, text,
           greatest(CAST(floor(length(text) / 4) AS INT), 1) AS step
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
)
SELECT media_id, f.i AS frame_idx,
       md5(substring(text, i * step + 1, step)) AS frame_md5,
       CAST(least(greatest(length(text) - i * step, 0), step)
            AS BIGINT) AS n_bytes
FROM vids, unnest(generate_series(0, 3)) AS f(i)
ORDER BY media_id, frame_idx
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table_from_documents(spark.table("documents"))
    frames = frame_sample(media, n_frames=4, fake=True)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5("frame_bytes").alias("frame_md5"),
        F.octet_length("frame_bytes").cast("long").alias("n_bytes"),
    ).orderBy("media_id", "frame_idx")
