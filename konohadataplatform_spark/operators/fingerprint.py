"""Perceptual media fingerprints: image dHash + audio fingerprint.

Beyond-reference surface (the reference's media story stops at raw
object-storage landing — ``docs/architecture.md`` S3 zones); these are
the dedup primitives a 100 TB multimodal training-data pipeline runs
over decoded media: perceptual (difference) hashing catches re-encoded
/ re-compressed duplicate images that byte-level ``exact_dedup`` can
never see, and a windowed-energy audio fingerprint does the same for
audio clips.

Scale posture
-------------
- Decode + hash runs in ``mapInPandas`` over the payload scan: media
  bytes NEVER cross a shuffle; only the (media_id, 64-bit-max hash)
  pair — a few bytes per row — reaches the exchange.
- Exact-duplicate grouping is one hash-partitioned aggregate (same
  plan shape as ``exact_dedup``).
- Near-duplicate search is banded Hamming LSH, the same family as
  ``simhash_candidates``: split the hash into ``bands`` contiguous
  bit-bands and equi-join per band. Pigeonhole guarantee: with
  ``bands > max_hamming`` every pair within the Hamming radius shares
  at least one intact band, so recall is exactly 1.0 — the band join
  is a *candidate filter*, not an approximation.
- All comparisons are JVM-side (``^`` + ``bit_count`` inside
  whole-stage codegen); Python touches only the decode.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from konohadataplatform_spark.operators.multimodal import (
    decode_audio,
    decode_image,
)

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("nbits", T.IntegerType(), True),
    ]
)

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), True),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("total_energy", T.LongType(), True),
    ]
)


def _gray(px: bytes, channels: int) -> list[int]:
    """Integer-exact luma: mean of the first 3 channels (floor), the
    sample itself for single-channel images. Alpha is ignored — a
    re-encode that only changes alpha handling should not change the
    perceptual hash."""
    if channels == 1:
        return list(px)
    n = len(px) // channels
    use = min(channels, 3)
    return [
        sum(px[i * channels + c] for c in range(use)) // use for i in range(n)
    ]


def dhash_bits(gray: list[int], width: int, height: int) -> int:
    """Difference hash over the native grid: bit k (k = r*(width-1)+x)
    is set iff gray[r][x+1] > gray[r][x]. The classic dHash resizes to
    9x8 first (64 bits); on an already-tiny grid the resize is the
    identity minus one column, so we hash the native grid and report
    ``nbits = (width-1)*height`` alongside."""
    h = 0
    for r in range(height):
        base = r * width
        for x in range(width - 1):
            if gray[base + x + 1] > gray[base + x]:
                h |= 1 << (r * (width - 1) + x)
    # two's-complement into signed 64-bit: a full 64-bit hash with bit
    # 63 set must still fit Spark LongType / DuckDB BIGINT; band
    # extraction masks after the shift, so signedness never leaks into
    # bucket values
    return h - (1 << 64) if h >= 1 << 63 else h


def _resample(
    gray: list[int], src_w: int, src_h: int, width: int, height: int
) -> list[int]:
    """Nearest-neighbor gray resample with ``resize_image``'s index
    arithmetic (sx = x*src_w//width), applied to the already-decoded
    luma plane so the resize costs no re-encode round trip."""
    return [
        gray[(y * src_h // height) * src_w + (x * src_w // width)]
        for y in range(height)
        for x in range(width)
    ]


def dhash_features(
    media: DataFrame, *, resize_to: tuple[int, int] | None = None
) -> DataFrame:
    """(media_id, content) -> (media_id, dhash, width, height, nbits).

    Decodes with the native codec set (BMP/PNG/JPEG/TIFF — anything
    ``decode_image`` handles) inside Arrow batches; undecodable rows
    surface as null dhash rather than failing the stage.

    ``resize_to=(9, 8)`` is the production geometry: every image is
    nearest-neighbor-resampled to a fixed 9x8 luma grid before hashing
    — a full 64-bit dHash independent of source dimensions, which is
    what makes cross-resolution duplicates collide AND gives the
    near-dup band join 16-bit bands (65k buckets) at scale. The
    default (native grid) keeps the hash exactly recomputable by the
    fixture oracle. Reported width/height stay the SOURCE dims either
    way (the hash geometry is in ``nbits``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((mid, None, None, None, None))
                    continue
                try:
                    img = decode_image(bytes(content))
                except Exception:
                    rows.append((mid, None, None, None, None))
                    continue
                w, hgt = img["width"], img["height"]
                ch = img.get("channels") or (
                    len(img["pixels"]) // (w * hgt) if w * hgt else 1
                )
                gray = _gray(bytes(img["pixels"]), ch)
                if resize_to is not None:
                    gw, gh = resize_to
                    gray = _resample(gray, w, hgt, gw, gh)
                else:
                    gw, gh = w, hgt
                rows.append(
                    (mid, dhash_bits(gray, gw, gh), w, hgt, (gw - 1) * gh)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields]
            )

    return media.mapInPandas(run, DHASH_SCHEMA)


def dhash_groups(feats: DataFrame) -> DataFrame:
    """Exact perceptual-duplicate groups: one hash-partitioned
    aggregate on the (tiny) hash column."""
    return (
        feats.where(F.col("dhash").isNotNull())
        .groupBy("dhash")
        .agg(
            F.min("media_id").alias("kept_media_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dhash_neardup_pairs(
    feats: DataFrame,
    *,
    nbits: int = 28,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs within ``max_hamming`` bits, via
    banded Hamming LSH with exact verification.

    Requires ``bands > max_hamming`` (pigeonhole: a pair differing in
    <= max_hamming bits keeps >= 1 of ``bands`` disjoint bands intact,
    so the band equi-join has recall 1.0). The verify step is an
    integer ``bit_count(a ^ b)`` in whole-stage codegen. Band width is
    ``ceil(nbits / bands)``; at production geometry (resize to 9x8 ->
    64-bit hash, 8 bands of 8) each band bucket holds ~n/256 rows —
    size buckets by choosing ``bands`` so the per-bucket self-join
    stays bounded, exactly like ``simhash_candidates``.

    ``max_bucket`` is the skew guard for the 100 TB path (same
    contract as ``semantic_dedup``): band buckets holding more rows
    than the cap — flat-color thumbnails, corrupt-but-decodable
    frames, any hash hotspot — are dropped from candidate generation
    before the self-join can go quadratic on them. Capping trades the
    recall guarantee on exactly those hot hashes (a pair is still
    found through any of its OTHER uncapped bands), deterministically:
    bucket sizes are data-determined, so an oracle can replay the
    cap."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} "
            "for the pigeonhole recall guarantee"
        )
    width = -(-nbits // bands)
    mask = (1 << width) - 1
    f = feats.where(F.col("dhash").isNotNull()).select("media_id", "dhash")
    banded = f.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(*[F.lit(i) for i in range(bands)])
        ).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(dhash, band * {width}) & {mask}"),
    )
    if max_bucket is not None:
        sizes = banded.groupBy("band", "band_val").agg(
            F.count("*").alias("_bucket_n")
        )
        # un-hinted join: the sizes side is one row per distinct
        # (band, bucket) — usually metadata-sized, but unbounded in
        # principle, so let AQE pick broadcast vs shuffle (the r6
        # semantic_dedup lesson: never force-broadcast a data-sized
        # side)
        banded = (
            banded.join(sizes, ["band", "band_val"])
            .where(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    # verify (cheap codegen bit_count) BEFORE the pair-dedup exchange:
    # the Hamming filter keeps ~C(nbits, <=max_hamming)/2^nbits of the
    # candidates, so filtering first shrinks the distinct's shuffle by
    # orders of magnitude
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("a_id"),
            F.col("b.media_id").alias("b_id"),
            F.expr(
                "cast(bit_count(a.dhash ^ b.dhash) as int)"
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
    )


def audio_fingerprint_features(
    media: DataFrame, *, window: int = 4
) -> DataFrame:
    """(media_id, content[WAV]) -> (media_id, fingerprint, n_windows,
    total_energy).

    A compact, codec-free audio fingerprint over fixed windows of
    ``window`` samples — three families of bits, concatenated LSB
    first (``nw`` = number of full windows):

    - bits [0, nw-1): energy ascent — ``energy[k+1] > energy[k]``
      (the shape of the loudness envelope; robust to uniform gain)
    - bits [nw-1, 2*nw-1): zero-crossing parity per window (a crude
      spectral register: high-frequency content flips it)
    - bits [2*nw-1, 3*nw-1): peak >= 2^14 per window (clipping /
      loudness flags)

    Exact integer arithmetic end to end so an engine-independent
    oracle can replay it from the synthetic sample bytes. Undecodable
    payloads surface as null fingerprints."""

    def one(samples: list[int]) -> tuple[int, int, int]:
        nw = len(samples) // window
        wins = [samples[k * window : (k + 1) * window] for k in range(nw)]
        energies = [sum(v * v for v in w) for w in wins]
        zcr = [
            sum(1 for i in range(window - 1) if (w[i] < 0) != (w[i + 1] < 0))
            for w in wins
        ]
        peaks = [max(abs(v) for v in w) for w in wins]
        fp = 0
        for k in range(nw - 1):
            if energies[k + 1] > energies[k]:
                fp |= 1 << k
        for k in range(nw):
            if zcr[k] % 2 == 1:
                fp |= 1 << (nw - 1 + k)
        for k in range(nw):
            if peaks[k] >= 1 << 14:
                fp |= 1 << (2 * nw - 1 + k)
        return fp, nw, sum(energies)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((mid, None, None, None))
                    continue
                try:
                    au = decode_audio(bytes(content))
                except Exception:
                    rows.append((mid, None, None, None))
                    continue
                fp, nw, te = one(au["samples"])
                rows.append((mid, fp, nw, te))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
            )

    return media.mapInPandas(run, AUDIO_FP_SCHEMA)
