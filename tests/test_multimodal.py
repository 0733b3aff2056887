"""Multimodal plumbing tests: binaryFile source → Arrow decode → features,
parquet packing round trip (SURVEY.md §2.10 q_llm_multimodal).
"""

from __future__ import annotations

from kse.multimodal import extract_features, pack_to_parquet, read_binary_dir

PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + bytes(range(40))
JPEG_MAGIC = b"\xff\xd8\xff\xe0" + bytes(range(60))
WAV_MAGIC = b"RIFF" + b"\x00" * 4 + b"WAVE" + bytes(range(20))


def _write_media(dir_):
    (dir_ / "a.png").write_bytes(PNG_MAGIC)
    (dir_ / "b.jpg").write_bytes(JPEG_MAGIC)
    (dir_ / "c.wav").write_bytes(WAV_MAGIC)
    (dir_ / "d.bin").write_bytes(b"\x00\x01\x02")


def test_binary_source_and_decode(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    _write_media(media)
    files = read_binary_dir(spark, str(media))
    assert files.count() == 4
    feats = {r.path.rsplit("/", 1)[-1]: r for r in extract_features(files).collect()}
    assert feats["a.png"].mime == "image/png"
    assert feats["b.jpg"].mime == "image/jpeg"
    assert feats["c.wav"].mime == "audio/wav"
    assert feats["d.bin"].mime == "application/octet-stream"
    assert feats["a.png"].n_bytes == len(PNG_MAGIC)
    assert feats["a.png"].width >= 16 and feats["a.png"].height >= 12


def test_glob_filter_prunes_at_listing(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    _write_media(media)
    only_png = read_binary_dir(spark, str(media), glob="*.png")
    assert only_png.count() == 1


def test_pack_to_parquet_round_trip(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    _write_media(media)
    out = str(tmp_path / "packed")
    files = read_binary_dir(spark, str(media))
    pack_to_parquet(files, out, partitions=2)
    packed = spark.read.parquet(out)
    # same features whether decoded from raw files or packed shards
    a = {r.checksum for r in extract_features(files).collect()}
    b = {r.checksum for r in extract_features(packed).collect()}
    assert a == b
