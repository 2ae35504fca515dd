"""Multimodal/binary-column queries (SURVEY.md §2.4-J `llm_multimodal`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.multimodal.columns import decode_media, synthesize_media
from local_etl_spark.queries._util import t
from local_etl_spark.registry import query


@query(
    "llm_multimodal",
    family="llm",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column basics: byte length + content hash.

    The binary payload is the utf-8 text bytes (a stand-in for media
    bytes); length/sha are JVM built-ins over BinaryType — the two ops
    every blob pipeline needs first (size accounting + content
    addressing).
    """
    payload = F.col("text").cast("binary")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


@query("llm_media_decode", family="llm", oracle=None)
def llm_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media decode: REAL container parsing (PPM / WAV /
    Y4M magic-sniff + header grammar + pixel/sample/frame stats) inside
    mapInPandas — multimodal/columns.py. Rows-only: the kernel output
    isn't SQL-expressible; tests/test_llm_media_text.py cross-checks
    every decoded field against a driver-side reference parse."""
    media = synthesize_media(t(spark, sf_dir, "documents"))
    return decode_media(media)


@query("llm_media_framesample", family="llm", oracle=None)
def llm_media_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the media table: a real Y4M stream
    walk emitting one row per sampled frame with the sha1 of that
    frame's actual YUV bytes (multimodal/columns.py frame_sample;
    pytest ground truth in tests/test_llm_media_text.py). Rows-only:
    the sampled-frame fan-out isn't SQL-expressible."""
    from local_etl_spark.multimodal.columns import frame_sample

    # r14: frame sampling reads only video rows — synthesize only them
    media = synthesize_media(t(spark, sf_dir, "documents"), "video")
    return frame_sample(media, every_n=10)


@query("llm_media_resize", family="llm", oracle=None)
def llm_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real nearest-neighbor image downscale over the media table's
    image rows: the kernel parses each P6 PPM, samples every 2nd pixel
    row/column, and re-emits a well-formed smaller PPM whose sha1 is
    the output's content address (multimodal/columns.py resize_images;
    pytest cross-checks every resized payload against a driver-side
    reference resample). Rows-only: byte-level re-encoding isn't
    SQL-expressible."""
    from local_etl_spark.multimodal.columns import resize_images

    # r14: the resize kernel drops non-image rows on arrival, so only
    # the image third is synthesized (guide §2.3 — filter before the
    # opaque Python op; payloads for kept rows are byte-identical)
    media = synthesize_media(t(spark, sf_dir, "documents"), "image")
    return resize_images(media, factor=2)


@query("llm_audio_features", family="llm", oracle=None)
def llm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio feature extraction over the media table's WAV
    rows: per 64-sample window, RMS energy and peak amplitude from the
    real PCM16 stream (multimodal/columns.py audio_features) — the
    frame-level fan-out in front of any audio model, same row-per-unit
    shape as frame_sample. Rows-only; pytest re-derives every window
    from the same bytes driver-side."""
    from local_etl_spark.multimodal.columns import audio_features

    # r14: audio-only kernel — synthesize only the audio third
    media = synthesize_media(t(spark, sf_dir, "documents"), "audio")
    return audio_features(media, win=64)


@query("llm_video_scenes", family="llm", oracle=None)
def llm_video_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the media table's Y4M rows: mean
    absolute luma difference between consecutive frames, flagged
    against a fixed threshold (multimodal/columns.py scene_cuts) —
    the shot-boundary step of video curation. Rows-only; pytest
    walks the same streams driver-side and compares every (frame,
    mad, flag) row."""
    from local_etl_spark.multimodal.columns import scene_cuts

    # r14: video-only kernel — synthesize only the video third
    media = synthesize_media(t(spark, sf_dir, "documents"), "video")
    return scene_cuts(media)


PHASH_HAMMING_T = 6  # near-dup bar; 8 one-byte bands guarantee ham<=7
PHASH_BANDS = 8


@query("llm_image_phash", family="llm", oracle=None)
def llm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the media table: aHash/dHash
    from the REAL P6 pixel planes (multimodal/columns.py image_hashes,
    all-integer — bit-reproducible), then SimHash-style banding turns
    the all-pairs hamming search into PHASH_BANDS equi-joins: a pair
    with hamming ≤ 7 must agree on at least one of 8 one-byte bands
    (pigeonhole), so the candidate join is EXACT for the ≤6 bar — no
    recall loss, no nested loop. Verification is one xor+bit_count per
    candidate. The content-defined signature in front of vision dedup:
    byte-exact hashes miss re-encodes; these survive them.

    Scale: hashing is one Arrow-batched map pass; the 8 band joins key
    on (band, byte) — at 100 TB the postings stay hash-partitioned and
    only same-byte buckets pair. Rows-only (binary kernel + iterative
    banding isn't SQL-expressible); tests/test_llm_media_text.py
    recomputes every hash with an independent NumPy reference and the
    exact pair set by brute force.
    """
    # r14: image-only kernel — synthesize only the image third
    # (guide §2.3; video payloads are the most expensive to build and
    # were thrown away by the kernel's modality check)
    media = synthesize_media(t(spark, sf_dir, "documents"), "image")
    from local_etl_spark.multimodal.columns import image_hashes

    hashes = image_hashes(media).persist()
    bands = hashes.select(
        "doc_id",
        "ahash",
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("ahash"), i * 8)
                    .bitwiseAND(F.lit(255))
                    .alias("bv"),
                )
                for i in range(PHASH_BANDS)
            ])
        ).alias("k"),
    ).select("doc_id", "ahash", "dhash", "k.band", "k.bv")
    a, b = bands.alias("a"), bands.alias("b")
    ham_a = F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash")))
    ham_d = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            ham_a.alias("ham_ahash"),
            ham_d.alias("ham_dhash"),
        )
        .filter(F.col("ham_ahash") <= PHASH_HAMMING_T)
        .dropDuplicates(["d1", "d2"])
    )


AUDIO_FP_HAMMING_T = 6  # near-dup bar; 8 one-byte bands cover ham<=7
AUDIO_FP_JOIN_BANDS = 8


@query("llm_audio_fingerprint", family="llm", oracle=None)
def llm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality dedup over the media table (VERDICT r9 #8 —
    completes the modality coverage of the dedup funnel: text has
    exact→near→semantic, images have phash; this is the audio
    member). Each WAV's PCM16 stream maps to a 64-bit energy-envelope
    dHash (multimodal/columns.py audio_fp64: 65 length-normalized
    band energies as exact integer sums of squares, bit i =
    sign(energy[i+1] − energy[i]) — the loudness contour, gain- and
    duration-robust, the Haitsma–Kalker idea in 64 bits). Candidate
    pairs come from the llm_image_phash pigeonhole machinery: a pair
    with hamming ≤ 7 must agree on ≥1 of 8 one-byte bands, so 8
    equi-joins are EXACT for the ≤{AUDIO_FP_HAMMING_T} bar — no
    nested loop, no recall loss. Verification is one xor+bit_count
    per candidate. Output is one row per audio doc — fingerprint plus
    its near-dup census (n_near_dups, min_hamming) — so the result is
    non-degenerate at every SF (the shipped sf0.01 corpus contains no
    pair within the bar; a pair-list would record 0 rows externally).

    Scale: fingerprinting is one Arrow-batched map pass (each stream
    read once); the 8 band joins key on (band, byte) so postings stay
    hash-partitioned and only same-byte buckets pair at any corpus
    size. Rows-only (binary kernel + banding isn't SQL-expressible);
    tests/test_llm_media_text.py recomputes every fingerprint with an
    independent reference and the exact per-doc census against the
    brute-force pair set.
    """
    from local_etl_spark.multimodal.columns import audio_fingerprints

    # r14: audio-only kernel — synthesize only the audio third
    media = synthesize_media(t(spark, sf_dir, "documents"), "audio")
    fps = audio_fingerprints(media).persist()
    bands = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("fp"), i * 8)
                    .bitwiseAND(F.lit(255))
                    .alias("bv"),
                )
                for i in range(AUDIO_FP_JOIN_BANDS)
            ])
        ).alias("k"),
    ).select("doc_id", "fp", "k.band", "k.bv")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    partners = (
        a.join(b, ["band", "bv"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("partner"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= AUDIO_FP_HAMMING_T)
        .dropDuplicates(["doc_id", "partner"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_near_dups"),
            F.min("hamming").cast("int").alias("min_hamming"),
        )
    )
    # one row per AUDIO DOC (non-degenerate at every SF — the shipped
    # sf0.01 corpus happens to contain no pair within the ≤6 bar, and
    # a 0-row external record pins nothing), carrying the fingerprint
    # and its near-dup census; the banded pair machinery above is the
    # same plan the pair-list form would run.
    return fps.join(partners, "doc_id", "left").select(
        "doc_id",
        "n_samples",
        "fp_hex",
        F.coalesce(F.col("n_near_dups"), F.lit(0).cast("bigint")).alias(
            "n_near_dups"
        ),
        F.coalesce(F.col("min_hamming"), F.lit(-1).cast("int")).alias(
            "min_hamming"
        ),
    )


# --- cross-modal near-dup census (round 13) ----------------------------

CROSSM_MEDIA_T = 6  # media-channel near-dup bar (the phash/audio bars)
_CM_BANDS = 8


def _cm_banded_partners(
    df: DataFrame, fp_col: str, threshold: int, extra_key: list[str]
) -> DataFrame:
    """Pigeonhole-banded hamming partners (both directions): a pair
    with hamming ≤ 7 over a 64-bit signature agrees on ≥1 of 8
    disjoint one-byte bands, so 8 equi-joins are EXACT for any bar
    ≤ 7 — the llm_image_phash machinery, factored for the tri-channel
    census. ``extra_key`` columns join too (the media channel adds
    the channel name so an image ahash can never pair with an audio
    fingerprint that happens to share a byte)."""
    bands = df.select(
        "doc_id",
        fp_col,
        *extra_key,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col(fp_col), i * 8)
                    .bitwiseAND(F.lit(255))
                    .alias("bv"),
                )
                for i in range(_CM_BANDS)
            ])
        ).alias("k"),
    ).select("doc_id", fp_col, *extra_key, "k.band", "k.bv")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col(f"a.{fp_col}").bitwiseXOR(F.col(f"b.{fp_col}")))
    return (
        a.join(b, ["band", "bv", *extra_key])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("partner"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
        .dropDuplicates(["doc_id", "partner"])
    )


def _cm_modality() -> F.Column:
    return F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )


@query("llm_dedup_cross_modal", family="llm", oracle=None)
def llm_dedup_cross_modal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal near-dup census (VERDICT r12 #7): unify the three
    modality fingerprints — text SimHash (every doc), image aHash
    (image docs), audio energy dHash (audio docs) — into ONE per-doc
    audit of "same content, different container":

      n_text_dups / min_text_hamming — text-space near-dups under the
        llm_dedup_simhash bar (the content channel);
      n_cross_container — text-space near-dups whose MODALITY differs
        (the same content travelling in a different container — the
        number a multimodal corpus audit needs);
      n_media_dups / min_media_hamming — near-dups in the doc's OWN
        media channel (phash for images, energy dHash for audio; −1
        for video docs, whose kernel emits scene cuts, not a 64-bit
        signature).

    All three channels ride the SAME pigeonhole band machinery
    (_cm_banded_partners — exact for bars ≤ 7, no nested loop, no
    recall loss); the media joins carry the channel name in the key so
    signatures never pair across channels. Scale: one Arrow pass per
    media kernel + three banded (band, byte)-keyed join families —
    hash-partitioned postings at any corpus size, the llm_dedup_*
    shape throughout.

    Rows-only (the media kernels parse binary grammars DuckDB can't),
    but the TEXT-modality slice is SQL-verified: the pytest runs a
    DuckDB oracle replaying the simhash machinery + doc_id%3 modality
    and compares n_text_dups / min_text_hamming / n_cross_container
    exactly, alongside the brute-force tri-channel census parity."""
    from local_etl_spark.queries.llm_dedup import (
        HAMMING_T,
        simhash_signatures,
    )

    docs = t(spark, sf_dir, "documents")
    sig = simhash_signatures(docs).persist()
    from local_etl_spark.multimodal.columns import (
        audio_fingerprints,
        image_hashes,
    )

    # r14: each union child synthesizes ONLY its own modality third.
    # The previous shared `synthesize_media(docs)` relation was
    # unpersisted, so each union child re-ran the full synthesis
    # (2 complete passes incl. the video payloads BOTH kernels drop —
    # the most expensive third to build). Now the image child builds
    # image payloads only and the audio child audio payloads only:
    # total synthesis work falls from 2 full passes to 2/3 of one
    # (guide §2.3 — filter before the opaque Python op).
    mfp = (
        image_hashes(synthesize_media(docs, "image"))
        .select("doc_id", F.col("ahash").alias("mfp"), F.lit("image").alias("chan"))
        .unionByName(
            audio_fingerprints(synthesize_media(docs, "audio")).select(
                "doc_id", F.col("fp").alias("mfp"), F.lit("audio").alias("chan")
            )
        )
        .persist()
    )
    modal = sig.select("doc_id", _cm_modality().alias("modality")).persist()

    text_partners = _cm_banded_partners(sig, "simhash", HAMMING_T, [])
    text_census = (
        text_partners.join(
            modal.withColumnRenamed("doc_id", "partner").withColumnRenamed(
                "modality", "p_modality"
            ),
            "partner",
        )
        .join(modal, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_text_dups"),
            F.min("hamming").cast("int").alias("min_text_hamming"),
            F.sum(
                F.when(F.col("p_modality") != F.col("modality"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_cross_container"),
        )
    )
    media_census = (
        _cm_banded_partners(mfp, "mfp", CROSSM_MEDIA_T, ["chan"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media_dups"),
            F.min("hamming").cast("int").alias("min_media_hamming"),
        )
    )
    return (
        modal.join(text_census, "doc_id", "left")
        .join(media_census, "doc_id", "left")
        .select(
            "doc_id",
            "modality",
            F.coalesce("n_text_dups", F.lit(0).cast("bigint")).alias(
                "n_text_dups"
            ),
            F.coalesce("min_text_hamming", F.lit(-1).cast("int")).alias(
                "min_text_hamming"
            ),
            F.coalesce("n_cross_container", F.lit(0).cast("bigint")).alias(
                "n_cross_container"
            ),
            F.coalesce("n_media_dups", F.lit(0).cast("bigint")).alias(
                "n_media_dups"
            ),
            F.coalesce("min_media_hamming", F.lit(-1).cast("int")).alias(
                "min_media_hamming"
            ),
        )
    )
