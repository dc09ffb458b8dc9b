"""Multimodal plumbing tests: schemas, batch shapes, determinism, stub seams."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from educational_vector_database_spark import multimodal as M


def _media(spark):
    return M.synth_media(spark, n_images=12, n_audio=4, n_videos=3, n_frames=8)


def test_synth_media_schema_and_counts(spark):
    df = _media(spark)
    assert df.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,content:binary,"
        "meta:struct<width:int,height:int,n_channels:int,sample_rate:int,"
        "n_samples:int,n_frames:int,codec:string>>"
    )
    by_kind = {r.kind: r.n for r in df.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert by_kind == {"image": 12, "audio": 4, "video": 3}


def test_synth_media_deterministic(spark):
    a = _media(spark).filter("media_id = 5").head().content
    b = _media(spark).filter("media_id = 5").head().content
    assert bytes(a) == bytes(b)
    assert len(a) == 32 * 24 * 3


def test_resize_images(spark):
    out = M.resize_images(_media(spark), out_w=8, out_h=6)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.content) == 8 * 6 * 3
        assert (r.meta.width, r.meta.height) == (8, 6)
    # nearest-neighbor must pick real source pixels: resized (0,0) == source (0,0)
    src = _media(spark).filter("media_id = 0").head()
    dst = next(r for r in rows if r.media_id == 0)
    assert bytes(dst.content)[:3] == bytes(src.content)[:3]


def test_image_features_shape_and_range(spark):
    feats = M.image_features(_media(spark), n_bins=8).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.embedding) == 2 * 3 + 8
        means, hist = r.embedding[:3], r.embedding[6:]
        assert all(0 <= m <= 255 for m in means)
        assert abs(sum(hist) - 1.0) < 1e-9  # normalized histogram


def test_image_features_compose_with_knn(spark):
    """Media features are a drop-in embedding column for the kNN operators."""
    from educational_vector_database_spark.operators import knn as K

    feats = M.image_features(_media(spark))
    q = [float(x) for x in feats.filter("media_id = 3").head().embedding]
    top = K.knn(feats, q, k=3, id_col="media_id").collect()
    assert top[0].media_id == 3  # self is nearest
    assert abs(top[0].score - 1.0) < 1e-12


def test_sample_frames(spark):
    frames = M.sample_frames(_media(spark), every_k=4)
    rows = frames.collect()
    # 3 videos x ceil(8/4)=2 frames
    assert len(rows) == 6
    assert {r.frame_index for r in rows} == {0, 4}
    for r in rows:
        assert len(r.content) == 32 * 24 * 3
        assert r.kind == "image"
    # sampled frame bytes must come from the right offset of the source buffer
    src = _media(spark).filter("media_id = 17").head()
    fb = 32 * 24 * 3
    f4 = next(r for r in rows if r.media_id == 17 and r.frame_index == 4)
    assert bytes(f4.content) == bytes(src.content)[4 * fb : 5 * fb]


def test_audio_features(spark):
    rows = M.audio_features(_media(spark)).collect()
    assert len(rows) == 4
    for r in rows:
        rms_mean, rms_std, zc, peak = r.embedding
        assert rms_mean > 0 and peak > 0 and 0 <= zc <= 1


def test_compressed_codec_raises_not_implemented(spark):
    # webp is outside even the PIL-backed seam's dispatch ("png"/"jpeg"),
    # so this raises regardless of whether PIL is installed
    df = spark.createDataFrame(
        [(0, "image", b"\xff\xd8\xff", (4, 4, 3, None, None, None, "webp"))],
        M.MEDIA_SCHEMA_DDL,
    )
    with pytest.raises(Exception) as e:
        M.image_features(df).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_media_stats_metadata_only(spark):
    stats = {r.kind: (r.n, r.total_bytes) for r in M.media_stats(_media(spark)).collect()}
    assert stats["image"][0] == 12
    assert stats["image"][1] == 12 * 32 * 24 * 3
    assert stats["video"][1] == 3 * 32 * 24 * 3 * 8
    assert stats["audio"][1] == 4 * 16000 * 2  # int16 PCM


def test_pil_seam_decodes_png_with_raw_parity(spark):
    """Optional-dep seam proof (the HFEmbeddings importorskip contract for
    media): with PIL installed, a PNG payload decodes through
    _decode_image_array and yields BIT-IDENTICAL features to the raw-codec
    path of the same pixels (PNG is lossless). Skipped where PIL is absent
    — the seam then stays the documented NotImplementedError."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="RGB").save(buf, format="PNG")
    png_bytes = buf.getvalue()

    # seam-level parity
    decoded = M._decode_image_array(
        png_bytes, {"codec": "png", "height": 24, "width": 32, "n_channels": 3}
    )
    assert (decoded == arr).all()

    # operator-level parity: raw row vs png row -> identical feature vectors
    df = spark.createDataFrame(
        [
            (0, "image", arr.tobytes(), (32, 24, 3, None, None, None, "raw")),
            (1, "image", png_bytes, (32, 24, 3, None, None, None, "png")),
        ],
        M.MEDIA_SCHEMA_DDL,
    )
    feats = {r.media_id: r.embedding for r in M.image_features(df).collect()}
    assert feats[0] == feats[1]
