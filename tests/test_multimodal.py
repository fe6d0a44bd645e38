"""Multimodal binary-column plumbing: schema, Arrow batch shape, stubbed
decode, frame-sample explode."""

from __future__ import annotations

from mapreduceinfrastructure_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    make_media_table,
)


def test_media_table_schema(spark, sf_dir):
    media = make_media_table(spark, sf_dir)
    types = dict(media.dtypes)
    assert types["media"] == "binary"
    assert types["media_type"] == "string"
    assert types["meta"].startswith("struct")


def test_extract_features_deterministic(spark, sf_dir):
    media = make_media_table(spark, sf_dir)
    feats = extract_features(media)
    rows = {r["doc_id"]: r for r in feats.collect()}
    n_docs = media.count()
    assert len(rows) == n_docs
    again = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert rows == again  # fake decode is deterministic
    r0 = next(iter(rows.values()))
    assert r0["n_bytes"] > 0 and len(r0["head_hex"]) == 16
    assert r0["width"] >= 1 and r0["height"] >= 1
    assert 0.0 <= r0["byte_mean"] <= 255.0


def test_decode_stub_contract():
    w, h = decode_image(b"x" * 1000)
    assert w >= 1 and h >= 1
    assert decode_image(b"x" * 1000) == (w, h)


def test_header_parse_roundtrip():
    """synth_media_header (struct packing) -> parse_media_header (byte
    scan) round-trips the doc_id-derived dims for both containers, and
    the JPEG scan survives a preceding APP0 segment (marker walk, not
    fixed offset)."""
    from mapreduceinfrastructure_spark.operators.multimodal import (
        parse_media_header,
        synth_media_header,
    )

    assert parse_media_header(synth_media_header(9) + b"tail") == (
        "png", 9 % 640 + 16, 9 % 480 + 16, 4,
    )
    assert parse_media_header(synth_media_header(10) + b"tail") == (
        "jpeg", 10 % 640 + 16, 10 % 480 + 16, 3,
    )
    assert parse_media_header(synth_media_header(11) + b"xy" * 20) is None
    # JPEG with an APP0 (JFIF) segment before SOF0: the scan must walk it
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof = synth_media_header(10)[2:]  # SOF0 segment only
    assert parse_media_header(b"\xff\xd8" + app0 + sof) == (
        "jpeg", 10 % 640 + 16, 10 % 480 + 16, 3,
    )
    assert parse_media_header(b"\x89PNG" + bytes(30)) is None  # partial sig


def test_extract_features_decodes_headers(spark, sf_dir):
    media = make_media_table(spark, sf_dir)
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    for doc_id, r in feats.items():
        if doc_id % 3 == 0:
            assert (r["fmt"], r["width"], r["height"], r["channels"]) == (
                "png", doc_id % 640 + 16, doc_id % 480 + 16, 4,
            )
        elif doc_id % 3 == 1:
            assert (r["fmt"], r["width"], r["height"], r["channels"]) == (
                "jpeg", doc_id % 640 + 16, doc_id % 480 + 16, 3,
            )
        else:
            assert r["fmt"] == "raw" and r["channels"] == 3


def test_frame_sample_explodes(spark, sf_dir):
    media = make_media_table(spark, sf_dir).limit(10)
    frames = frame_sample(media, every_n_bytes=50)
    pdf = frames.toPandas()
    assert (pdf.frame_offset % 50 == 0).all()
    assert pdf.groupby("doc_id").size().min() >= 1


def test_resize_media_shapes(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators.multimodal import (
        make_media_table,
        resize_media,
    )

    media = make_media_table(spark, sf_dir)
    out = resize_media(media, target_w=8, target_h=8)
    assert [f.name for f in out.schema.fields] == ["doc_id", "media", "width", "height"]
    rows = out.collect()
    assert len(rows) == media.count()
    cap = 3 * 8 * 8
    assert all(len(r["media"]) <= cap for r in rows)
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    # deterministic: same input -> same bytes
    again = {r["doc_id"]: bytes(r["media"]) for r in resize_media(media, 8, 8).collect()}
    assert all(bytes(r["media"]) == again[r["doc_id"]] for r in rows)


def test_decode_with_pil_present(monkeypatch):
    """Round-4 guard fix: with PIL importable, decode_image must attempt
    the real decode (returning the image's size) and fall back to the
    deterministic fake for payloads PIL can't parse — never raise.
    PIL is absent in this container, so simulate it with a stub module
    exposing the Image.open contract."""
    import types

    from mapreduceinfrastructure_spark.operators import multimodal as mm

    class _FakeImg:
        size = (320, 240)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    def _open(buf):
        data = buf.read()
        if not data.startswith(b"\x89PNG"):
            raise OSError("cannot identify image file")
        return _FakeImg()

    fake_pil = types.SimpleNamespace(Image=types.SimpleNamespace(open=_open))
    monkeypatch.setattr(mm, "PIL", fake_pil, raising=False)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)

    # decodable payload: real (stubbed-PIL) size comes back
    assert mm.decode_image(b"\x89PNG" + b"\x00" * 100) == (320, 240)
    # undecodable payload: deterministic fake, identical to PIL-absent env
    monkeypatch.setattr(mm, "_HAVE_PIL", False)
    want = mm.decode_image(b"x" * 1000)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    assert mm.decode_image(b"x" * 1000) == want


def test_audio_windows_match_numpy_reference(spark, sf_dir):
    """audio_windows (the fixed-geometry raw-PCM plumbing) vs a direct
    numpy recomputation from the same parquet text payloads — the
    rows-only external ground truth (pattern: bpe_merges / simhash HOF
    reference tests)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.multimodal import (
        AUDIO_HOP,
        AUDIO_WINDOW,
        audio_windows,
        make_media_table,
    )

    got = {
        (r["doc_id"], r["win_idx"], r["rms"])
        for r in audio_windows(make_media_table(spark, sf_dir)).collect()
    }

    from mapreduceinfrastructure_spark.operators.multimodal import (
        synth_media_header,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = set()
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        payload = synth_media_header(doc_id) + (text or "").encode("utf-8")
        pcm = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2").astype(
            np.float64
        )
        n_win = (
            (len(pcm) - AUDIO_WINDOW) // AUDIO_HOP + 1
            if len(pcm) >= AUDIO_WINDOW
            else 0
        )
        for w in range(n_win):
            seg = pcm[w * AUDIO_HOP : w * AUDIO_HOP + AUDIO_WINDOW]
            want.add((doc_id, w, round(float(np.sqrt(np.mean(seg * seg))), 6)))
    assert got == want
    assert len(got) > 0


def test_audio_energy_rate_derived_windows_match_numpy(spark, sf_dir):
    """audio_energy (r12: WAV-container energy with geometry from the
    PARSED fmt-chunk rate) vs a numpy recomputation that builds the
    same container, parses nothing, and derives windows from the
    doc_id-derived ground-truth rate/channels — so a Spark-side parse
    or slicing bug cannot cancel out."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.multimodal import (
        WAV_WIN_DIVISOR,
        audio_energy,
    )

    got = {
        (r["doc_id"], r["win_idx"], r["sample_rate"], r["rms"])
        for r in audio_energy(spark, sf_dir).collect()
    }

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = set()
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        ch = doc_id % 2 + 1
        rate = (doc_id % 3 + 1) * 8000
        body = (text or "").encode("utf-8")
        pcm = np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2").astype(
            np.float64
        )
        wf = rate // WAV_WIN_DIVISOR
        ws, hop = wf * ch, (wf // 2) * ch
        n_win = (len(pcm) - ws) // hop + 1 if len(pcm) >= ws else 0
        for w in range(n_win):
            seg = pcm[w * hop : w * hop + ws]
            want.add(
                (doc_id, w, rate, round(float(np.sqrt(np.mean(seg * seg))), 6))
            )
    assert got == want
    assert len(got) > 0
    # all three synthetic rates must actually appear (geometry variance)
    assert {r for (_, _, r, _) in got} == {8000, 16000, 24000}
