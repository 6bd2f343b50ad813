"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension. Image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct; decode / feature-extract
/ resize / frame-sample run as Arrow-batched kernels over ``mapInPandas``.

The actual media codecs are NOT available in this environment, so the
decode step is stubbed: :func:`decode_features` raises
``NotImplementedError`` unless ``fake=True``, in which case it computes a
deterministic fake feature vector from the payload bytes. The Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is
real and tested; swapping in a real codec is a one-function change.

Scale notes: payload bytes never shuffle — metadata extraction projects
away the binary column before any wide operation; the mapInPandas decode
is a narrow transformation that preserves partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import LSH_MAX_BUCKET, _drop_super_buckets

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap `documents` text as binary payloads with
    metadata — the stand-in corpus for multimodal plumbing tests.
    DataFrame[media_id, payload binary, meta struct<mime,n_bytes>]."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata projection (no payload movement): DataFrame[media_id,
    mime, n_bytes, payload_hash]. The binary column is pruned from any
    downstream shuffle."""
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.conv(F.substring(F.md5("payload"), 1, 15), 16, 10)
        .cast("long")
        .alias("payload_hash"),
    )


def media_metadata_sql() -> str:
    """DuckDB twin of :func:`media_metadata` over documents_as_media."""
    return """
SELECT doc_id AS media_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS payload_hash
FROM documents
"""


FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_features(
    media: DataFrame, fake: bool = False, dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode payloads → feature vectors via mapInPandas:
    DataFrame[media_id, features array<double>].

    With ``fake=False`` this raises NotImplementedError at execution time
    (no media codecs in this environment). With ``fake=True`` it derives a
    deterministic vector from the payload bytes: feature j = mean of every
    dim-th byte starting at j, scaled to [0, 1] — a stand-in with the same
    schema, batching, and partitioning behavior a real decoder would have.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires codec libraries not present "
                    "in this environment; pass fake=True for the "
                    "deterministic stand-in"
                )
            feats = []
            for payload in pdf["payload"]:
                buf = bytes(payload or b"")
                vec = []
                for j in range(dim):
                    sl = buf[j::dim]
                    vec.append(
                        (sum(sl) / len(sl) / 255.0) if sl else 0.0
                    )
                feats.append(vec)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, _FEATURES_SCHEMA
    )


def decode_features_sql(dim: int = FEATURE_DIM) -> str:
    """DuckDB twin of the deterministic fake decoder over
    documents_as_media, flattened to (media_id, dim, value) — the
    registered query shape. Feature j = mean(payload[j::dim]) / 255;
    DuckDB lacks byte-indexed BLOB substr, so bytes are recovered by
    slicing the hex encoding two chars at a time. Docs shorter than
    ``dim`` bytes null-fill via the grid left-join (the kernel's
    empty-slice 0.0 branch)."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         hex(encode(text)) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents
),
pos AS (
  SELECT media_id, hx, unnest(range(nb)) AS i FROM m
),
agg AS (
  SELECT media_id, CAST(i % {dim} AS INT) AS dim,
         AVG(CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS INT), 2))
             AS INT)) / 255.0 AS v
  FROM pos GROUP BY 1, 2
),
grid AS (
  SELECT media_id, CAST(unnest(range({dim})) AS INT) AS dim FROM m
)
SELECT g.media_id, g.dim, ROUND(COALESCE(a.v, 0.0), 6) AS value
FROM grid g LEFT JOIN agg a ON a.media_id = g.media_id AND a.dim = g.dim
"""


def frame_sample(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame' sampler stand-in: emit up to ``max_frames`` fixed-stride
    byte-offset frames per payload — the row-explosion shape of video
    frame sampling (one row per sampled frame), Catalyst-only.
    DataFrame[media_id, frame_idx, offset]."""
    n = F.col("meta.n_bytes")
    frames = F.least(
        F.ceil(n / F.lit(every_n_bytes)).cast("int"), F.lit(max_frames)
    )
    return media.select(
        "media_id",
        F.explode(
            F.when(frames >= 1, F.sequence(F.lit(0), frames - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).cast("long").alias("offset"),
    )


def frame_sample_sql(every_n_bytes: int = 64, max_frames: int = 8) -> str:
    """DuckDB twin of :func:`frame_sample` over documents_as_media."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
),
f AS (
  SELECT media_id,
         least(CAST(ceil(n_bytes / {float(every_n_bytes)!r}) AS INT),
               {max_frames}) AS frames
  FROM m
)
SELECT media_id,
       CAST(unnest(range(0, frames)) AS INT) AS frame_idx,
       CAST(unnest(range(0, frames)) * {every_n_bytes} AS BIGINT) AS offset
FROM f WHERE frames >= 1
"""


def chunk_media(
    media: DataFrame, window: int = 96, hop: int = 64
) -> DataFrame:
    """Overlapped byte-window chunking of media payloads — the
    audio/video shard step (Whisper-style fixed windows with hop):
    DataFrame[media_id, chunk_idx, start, chunk_len, fp] with one row
    per window of ``window`` bytes every ``hop`` bytes (the final
    window may be shorter; empty payloads emit nothing).

    ``fp`` is the md5 of the chunk's hex encoding — a cross-engine
    fingerprint (Spark's and DuckDB's ``hex`` agree byte-for-byte,
    both UPPERCASE, and md5-over-VARCHAR exists in both; DuckDB has
    no BLOB substring/md5, so slicing happens in hex space at doubled
    offsets — the decode_features oracle's technique). The payload
    itself NEVER leaves the row: chunk enumeration, slicing, and
    fingerprinting are one narrow projection — zero shuffle, the
    multimodal module's payload-locality contract — and downstream
    dedup/indexing consumes the fingerprints, not the bytes.
    """
    if window < 1 or hop < 1:
        raise ValueError("chunk_media: window and hop must be >= 1")
    n = F.col("meta.n_bytes")
    return (
        media.where(n > 0)
        .select(
            "media_id",
            F.hex(F.col("payload")).alias("hx"),
            n.alias("n_bytes"),
        )
        .select(
            "media_id",
            "n_bytes",
            F.explode(
                F.sequence(
                    F.lit(0),
                    ((F.col("n_bytes") - 1) / hop).cast("long"),
                )
            ).alias("chunk_idx"),
            F.col("hx"),
        )
        .select(
            "media_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * hop).cast("long").alias("start"),
            F.least(
                F.lit(window).cast("long"),
                F.col("n_bytes") - F.col("chunk_idx") * hop,
            ).alias("chunk_len"),
            F.md5(
                F.expr(
                    f"substring(hx, CAST(chunk_idx * {hop} * 2 + 1 AS INT),"
                    f" CAST(least({window}, n_bytes - chunk_idx * {hop})"
                    " * 2 AS INT))"
                )
            ).alias("fp"),
        )
    )


def chunk_media_sql(window: int = 96, hop: int = 64) -> str:
    """DuckDB twin of :func:`chunk_media` over documents_as_media
    (identical hex-space slicing, identical md5 fingerprints)."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
c AS (
  SELECT media_id, hx, n_bytes,
         unnest(range(0, (n_bytes - 1) // {hop} + 1)) AS chunk_idx
  FROM m
)
SELECT media_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_idx * {hop} AS BIGINT) AS start,
       CAST(least({window}, n_bytes - chunk_idx * {hop}) AS BIGINT)
         AS chunk_len,
       md5(substr(hx, CAST(chunk_idx * {hop} * 2 + 1 AS BIGINT),
                  CAST(least({window}, n_bytes - chunk_idx * {hop}) * 2
                       AS BIGINT))) AS fp
FROM c
"""


def media_ahash(media: DataFrame, bits: int = 60) -> DataFrame:
    """Average-hash perceptual fingerprint of each payload:
    DataFrame[media_id, ahash] — the aHash design (resize to a fixed
    grid, threshold each cell against the mean), applied to the
    opaque binary column: the payload is split into ``bits`` equal
    byte buckets (the resize analog), bit i set iff bucket i's mean
    exceeds the payload mean — integer-exact via cross-multiplication
    (s_i * n_bytes > S * c_i), no division anywhere. 60 bits keeps
    the fingerprint in one signed BIGINT word, the engine's
    sketch-word convention.

    On real images this runs on the decoded luma grid; the decode
    step stays honestly env-blocked (see :func:`decode_features`),
    but the whole fingerprint pipeline — byte recovery via the
    cross-engine hex-slice trick, per-bucket partial aggregation,
    threshold, bit packing — is real, distributed and value-oracled
    (x_media_ahash). Work is one narrow explode of byte positions
    (exactly the decode shape) followed by two aggregations with
    map-side combine; payload bytes themselves never shuffle, only
    (media_id, bucket, sum, count) rows do.

    Measured honestly: on TEXT payloads the fingerprint does NOT
    bring edit-level near-duplicates inside small Hamming distances
    (text edits shift bytes across buckets; byte means of prose are
    near-constant), so no corpus-level pairs query is registered —
    the Hamming pair search (:func:`media_ahash_pairs`) is pinned on
    a synthetic binary fixture where near-dup payloads genuinely
    cluster, the image regime it exists for.
    """
    m = media.where(F.length("payload") > 0).select(
        "media_id",
        F.hex(F.col("payload")).alias("_hx"),
        F.length(F.col("payload")).cast("long").alias("_nb"),
    )
    byt = m.select(
        "media_id",
        "_nb",
        F.expr(
            f"explode(sequence(CAST(0 AS BIGINT), _nb - 1))"
        ).alias("_i"),
        "_hx",
    ).select(
        "media_id",
        "_nb",
        F.expr(f"CAST(_i * {bits} DIV _nb AS INT)").alias("_bkt"),
        F.expr(
            "CAST(conv(substring(_hx, CAST(2 * _i + 1 AS INT), 2),"
            " 16, 10) AS BIGINT)"
        ).alias("_b"),
    )
    agg = byt.groupBy("media_id", "_nb", "_bkt").agg(
        F.sum("_b").alias("_s"), F.count("*").alias("_c")
    )
    tot = agg.groupBy("media_id").agg(F.sum("_s").alias("_S"))
    g, t = agg.alias("g"), tot.alias("t")
    return (
        g.join(t, "media_id")
        .groupBy("media_id")
        .agg(
            F.sum(
                F.when(
                    F.col("g._s") * F.col("g._nb")
                    > F.col("t._S") * F.col("g._c"),
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT),"
                        " CAST(_bkt AS INT))"
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("ahash")
        )
    )


def media_ahash_sql(bits: int = 60) -> str:
    """DuckDB twin of :func:`media_ahash` over documents_as_media —
    same byte buckets, same cross-multiplied threshold, same bit
    packing."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents WHERE octet_length(encode(text)) > 0
),
pos AS (SELECT media_id, nb, hx, unnest(range(nb)) AS i FROM m),
byt AS (
  SELECT media_id, nb, CAST((i * {bits}) // nb AS INT) AS bkt,
         CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS INT), 2))
              AS BIGINT) AS b
  FROM pos
),
agg AS (SELECT media_id, nb, bkt, SUM(b) AS s, COUNT(*) AS c
        FROM byt GROUP BY 1, 2, 3),
tot AS (SELECT media_id, SUM(s) AS tot_s FROM agg GROUP BY 1)
SELECT a.media_id,
       CAST(SUM(CASE WHEN a.s * a.nb > t.tot_s * a.c
                     THEN (CAST(1 AS BIGINT) << a.bkt)
                     ELSE 0 END) AS BIGINT) AS ahash
FROM agg a JOIN tot t ON a.media_id = t.media_id
GROUP BY 1
"""


def media_ahash_pairs(
    media: DataFrame,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate payload pairs by average-hash Hamming distance:
    DataFrame[media_a, media_b, hamming], media_a < media_b, hamming
    <= ``max_hamming``.

    The banded pigeonhole blocking the simhash text path uses, lifted
    to the multimodal column: split the fingerprint into ``bands``
    equal slices — any pair within Hamming ``bands - 1`` agrees on at
    least one slice — bucket-join on (band, slice), then verify with
    ``bit_count(xor)``. Never all-pairs; candidates are per-bucket.
    Completeness to Hamming ``bands - 1`` is pinned against a brute
    all-pairs check on a synthetic near-dup binary fixture
    (tests/test_similarity.py) — see :func:`media_ahash` for why no
    text-corpus pairs query is registered.
    """
    if bits % bands != 0:
        raise ValueError("media_ahash_pairs: bands must divide bits")
    if max_hamming > bands - 1:
        raise ValueError(
            "media_ahash_pairs: banded blocking is only complete up "
            f"to Hamming {bands - 1} with {bands} bands"
        )
    width = bits // bands
    h = media_ahash(media, bits)
    bk = h.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(ahash DIV {1 << (width * b)})"
                            f" % {1 << width}"
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "ahash", F.col("bk.band"), F.col("bk.key"))
    if max_bucket is not None:
        # super-bucket guard (see dedup.LSH_MAX_BUCKET): a fingerprint
        # slice shared by a degenerate payload cluster would make its
        # bucket's self-join quadratic in the cluster size.
        bk = _drop_super_buckets(bk, ["band", "key"], max_bucket)
    a = bk.alias("a")
    b = bk.alias("b")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.bit_count(
                F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("media_a", "media_b")
    )
