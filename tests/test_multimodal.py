"""Multimodal operator tests over the synthetic image corpus: decode
stats, resize round-trip, perceptual-hash near-dup behavior, stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parsel_spark.operators.multimodal import (
    audio_features,
    image_stats,
    perceptual_hash,
    resize_image,
    sample_video_frames,
)
from parsel_spark.sources.images import decode_image, encode_image
from parsel_spark.sources.synth import SynthConfig, image_pixels, synth_pages

CFG = SynthConfig(n_pages=24, n_hosts=4, out_degree=3, seed=3, with_images=True)


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, CFG).cache()
    df.count()
    return df


def test_image_stats_match_numpy(spark, pages) -> None:
    rows = pages.select(
        "image_id", "w", "h", "fmt",
        image_stats("bytes", "fmt").alias("stats"),
    ).collect()
    for row in rows:
        stats = row["stats"]
        assert stats["decode_ok"]
        assert stats["width"] == row["w"] and stats["height"] == row["h"]
        i = int(row["image_id"].split("-")[1])
        truth = image_pixels(i, row["w"], row["h"], CFG).astype(np.float64)
        if row["fmt"] in ("png", "bmp"):
            assert stats["mean_r"] == pytest.approx(truth[..., 0].mean())
        else:  # fake-lossy: close but quantized
            assert stats["mean_r"] == pytest.approx(truth[..., 0].mean(), abs=3.0)


def test_resize_roundtrip(spark, pages) -> None:
    rows = pages.select(
        "fmt", resize_image("bytes", "fmt", 16, 16).alias("small")
    ).collect()
    for row in rows:
        assert row["small"] is not None
        pixels = decode_image(bytes(row["small"]), "png")
        assert pixels.shape == (16, 16, 3)


def test_perceptual_hash_near_dup(spark) -> None:
    base = image_pixels(1, 32, 32, CFG)
    tweaked = base.copy()
    tweaked[0, 0] = [255, 255, 255]  # tiny perturbation
    different = image_pixels(2, 32, 32, CFG)
    df = spark.createDataFrame(
        [
            (0, encode_image(base, "png"), "png"),
            (1, encode_image(tweaked, "png"), "png"),
            (2, encode_image(different, "png"), "png"),
        ],
        "id long, bytes binary, fmt string",
    )
    rows = {
        r["id"]: r["ph"]
        for r in df.select("id", perceptual_hash("bytes", "fmt").alias("ph")).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(rows[0], rows[1]) <= 4  # near-dup: few bits differ
    assert ham(rows[0], rows[2]) > 8  # unrelated: many bits differ


def test_audio_features_pcm(spark) -> None:
    tone = (np.sin(np.linspace(0, 60, 8000)) * 16384).astype("<i2").tobytes()
    df = spark.createDataFrame([(tone,)], "bytes binary")
    row = df.select(audio_features("bytes").alias("a")).first()["a"]
    assert row["n_samples"] == 8000
    assert 0.3 < row["rms"] < 0.4  # sine RMS = amp/√2 = 0.3535
    assert row["peak"] == pytest.approx(0.5, abs=0.01)


def test_video_stub_raises(spark, pages) -> None:
    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        pages.select(sample_video_frames("bytes").alias("f")).collect()


def test_phash_near_dup_pairs_banded(spark) -> None:
    """Banded LSH blocking finds every pair within hamming<=3 (pigeonhole
    recall guarantee) and rejects pairs beyond the threshold."""
    from parsel_spark.operators.multimodal import phash_near_dup_pairs

    base = 0x123456789ABCDEF
    rows = [
        ("a", base),
        ("b", base ^ 0b11),            # hamming 2 vs a
        ("c", base ^ (1 << 17) ^ (1 << 33) ^ (1 << 49)),  # hamming 3, flips in 3 bands
        ("d", base ^ 0xF0F0),          # hamming 8 — beyond threshold
        ("e", 0x7FFFFFFFFFFFFFFF),     # unrelated
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["img_a"], r["img_b"]): r["hamming"]
        for r in phash_near_dup_pairs(df, max_hamming=3).collect()
    }
    # b vs c: hamming 5 -> excluded; d (8) and e excluded
    assert got == {("a", "b"): 2, ("a", "c"): 3}


def test_caption_pair_quality_flags_per_gate(spark) -> None:
    """Each curation gate fails on exactly its planted row and the keep
    conjunction admits only the clean pair (LAION-lineage rules:
    dimension floor, aspect ceiling, caption length band, word floor)."""
    from parsel_spark.operators.multimodal import caption_pair_quality_flags

    rows = [
        ("good", 640, 480, "a clear photo of a red bicycle"),
        ("tiny", 32, 100, "a clear photo of a red bicycle"),       # dims only (aspect 3.1x ok)
        ("banner", 2000, 100, "a clear photo of a red bicycle"),   # aspect 20x
        ("shortcap", 640, 480, "  hi "),                           # 2 chars
        ("longcap", 640, 480, "x" * 600),                          # > 512
        ("oneword", 640, 480, "photograph"),                       # 1 word
        ("emptycap", 640, 480, "   "),                             # empty
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int, caption string")
    got = {
        r["image_id"]: r.asDict()
        for r in df.select("image_id", *caption_pair_quality_flags()).collect()
    }
    assert got["good"]["keep"] is True
    assert got["tiny"]["ok_dims"] is False and got["tiny"]["ok_aspect"] is True
    assert got["banner"]["ok_aspect"] is False and got["banner"]["ok_dims"] is True
    assert got["shortcap"]["ok_caption_len"] is False
    assert got["shortcap"]["caption_len"] == 2  # trimmed
    assert got["longcap"]["ok_caption_len"] is False
    assert got["oneword"]["ok_caption_words"] is False
    assert got["oneword"]["ok_caption_len"] is True
    assert got["emptycap"]["ok_caption_len"] is False
    assert got["emptycap"]["caption_words"] == 0
    for k in ("tiny", "banner", "shortcap", "longcap", "oneword", "emptycap"):
        assert got[k]["keep"] is False


def test_caption_filter_is_map_only(spark) -> None:
    """The curation gate adds no exchange: the physical plan over a
    parquet-free in-memory scan contains no shuffle."""
    from parsel_spark.operators.multimodal import caption_pair_quality_flags

    df = spark.createDataFrame(
        [("a", 100, 100, "two words")], "image_id string, w int, h int, caption string"
    )
    plan = (
        df.select("image_id", *caption_pair_quality_flags())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_phash_clusters_keep_best_resolution(spark) -> None:
    """End-to-end image dedup at sf0.001: every planted 2-bit twin lands
    in its original's cluster and — carrying +64 px width — is the kept
    representative; non-dup images are their own singleton reps."""
    import __spark_entry__ as entry

    rows = entry.q_img_phash_clusters(spark, "/root/testdata/sf0.001").collect()
    by_id = {r["image_id"]: r for r in rows}
    twins = [r for r in rows if r["image_id"].endswith("-dup")]
    assert twins, "synthesis must plant twins at every SF"
    for twin in twins:
        orig = by_id[twin["image_id"][: -len("-dup")]]
        assert twin["cluster_id"] == orig["cluster_id"]
        assert twin["area"] > orig["area"]
        if not orig["is_rep"]:  # pair cluster: exactly the twin is kept
            assert twin["is_rep"] is True
    reps = sum(1 for r in rows if r["is_rep"])
    clusters = len({r["cluster_id"] for r in rows})
    assert reps == clusters


class TestAspectBuckets:
    def test_known_shapes_snap_to_their_bucket(self, spark) -> None:
        from parsel_spark.operators.multimodal import aspect_bucket

        rows = [
            (512, 512, "square_1_1"),
            (800, 600, "landscape_4_3"),
            (600, 800, "portrait_3_4"),
            (1920, 1080, "wide_16_9"),
            (1080, 1920, "tall_9_16"),
            (900, 600, "landscape_3_2"),
            (600, 900, "portrait_2_3"),
        ]
        df = spark.createDataFrame(
            [(w, h) for w, h, _ in rows], "w long, h long"
        )
        got = df.select("w", "h", aspect_bucket("w", "h").alias("b")).collect()
        expect = {(w, h): b for w, h, b in rows}
        for r in got:
            assert r["b"] == expect[(r["w"], r["h"])], (r["w"], r["h"], r["b"])

    def test_tie_resolves_to_earliest_ladder_entry(self, spark) -> None:
        from parsel_spark.operators.multimodal import aspect_bucket

        # w/h exactly between 1/1 and 4/3 -> dist ties -> square wins
        # 1/1 vs 4/3: midpoint 7/6
        got = (
            spark.createDataFrame([(7, 6)], "w long, h long")
            .select(aspect_bucket("w", "h").alias("b"))
            .first()["b"]
        )
        assert got == "square_1_1"

    def test_custom_ladder_and_stats(self, spark) -> None:
        from parsel_spark.operators.multimodal import aspect_bucket_stats

        ladder = [("sq", 1, 1), ("wide", 2, 1)]
        df = spark.createDataFrame(
            [(100, 100), (100, 100), (200, 100)], "w long, h long"
        )
        got = {
            r["bucket"]: (r["n_images"], r["total_pixels"])
            for r in aspect_bucket_stats(df, ladder=ladder).collect()
        }
        assert got == {"sq": (2, 20000), "wide": (1, 20000)}

    def test_empty_ladder_raises(self) -> None:
        import pytest

        from parsel_spark.operators.multimodal import aspect_bucket

        with pytest.raises(ValueError):
            aspect_bucket("w", "h", ladder=[])


class TestCaptionDedup:
    def test_groups_and_reps(self, spark) -> None:
        """Normalized-caption groups keep the largest-area member;
        case/whitespace variants merge; unique captions self-rep."""
        from parsel_spark.operators.multimodal import caption_dedup

        rows = [
            ("a", 100, 100, "A Cat"),
            ("b", 200, 200, "  a cat "),   # same group, bigger -> rep
            ("c", 150, 150, "a cat"),
            ("d", 10, 10, "a dog"),        # unique -> rep
        ]
        df = spark.createDataFrame(
            rows, "image_id string, w long, h long, caption string"
        )
        out = {r["image_id"]: r for r in caption_dedup(df).collect()}
        assert out["a"]["group_n"] == 3 and not out["a"]["is_rep"]
        assert out["b"]["is_rep"]
        assert not out["c"]["is_rep"]
        assert out["d"]["group_n"] == 1 and out["d"]["is_rep"]

    def test_tie_breaks_on_id(self, spark) -> None:
        from parsel_spark.operators.multimodal import caption_dedup

        rows = [("y", 50, 50, "t"), ("x", 50, 50, "t")]
        df = spark.createDataFrame(
            rows, "image_id string, w long, h long, caption string"
        )
        out = {r["image_id"]: r["is_rep"] for r in caption_dedup(df).collect()}
        assert out == {"x": True, "y": False}


class TestBucketBatches:
    def _images(self, spark, n=23, buckets=("a", "b")):
        rows = [(f"img{i:03d}", buckets[i % len(buckets)]) for i in range(n)]
        return spark.createDataFrame(rows, "image_id string, bucket string")

    def test_uniform_batches_partial_dropped(self, spark) -> None:
        from parsel_spark.operators.multimodal import bucket_batches

        out = bucket_batches(self._images(spark), batch_size=4).collect()
        # bucket a: 12 rows -> 3 full batches; bucket b: 11 -> 2 full (8)
        per = {}
        for r in out:
            per.setdefault((r["bucket"], r["batch_id"]), []).append(r["slot"])
        assert len(out) == 12 + 8
        for (_b, _id), slots in per.items():
            assert sorted(slots) == [0, 1, 2, 3]

    def test_keep_partial(self, spark) -> None:
        from parsel_spark.operators.multimodal import bucket_batches

        out = bucket_batches(
            self._images(spark), batch_size=4, drop_partial=False
        ).collect()
        assert len(out) == 23

    def test_deterministic_across_partitioning(self, spark) -> None:
        from parsel_spark.operators.multimodal import bucket_batches

        df = self._images(spark)
        a = sorted(map(tuple, bucket_batches(df, 4).collect()))
        b = sorted(map(tuple, bucket_batches(df.repartition(7), 4).collect()))
        assert a == b

    def test_bad_batch_size(self, spark) -> None:
        import pytest as _pytest

        from parsel_spark.operators.multimodal import bucket_batches

        with _pytest.raises(ValueError):
            bucket_batches(self._images(spark), batch_size=0)
