"""Multimodal binary-column plumbing: schema, Arrow batch shape,
determinism, and the real-codec guard."""

from __future__ import annotations

import pytest

from rt_bigdata_spark.operators.multimodal import (
    FEATURE_DIM,
    documents_as_media,
    extract_features,
    frame_sample,
)
from rt_bigdata_spark.sources.tables import load_table

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents").limit(50))


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "content", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType.typeName() == "struct"


def test_extract_features_shape_and_determinism(spark, media):
    out1 = {r.media_id: (r.n_bytes, tuple(r.features)) for r in extract_features(media).collect()}
    out2 = {r.media_id: (r.n_bytes, tuple(r.features)) for r in extract_features(media).collect()}
    assert out1 == out2  # deterministic across runs
    assert len(out1) == 50
    for n_bytes, feats in out1.values():
        assert n_bytes > 0
        assert len(feats) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in feats)


def test_extract_features_real_codec_guard(spark, media):
    # media here is TEXT bytes labeled "image": without PIL the gated
    # import raises the NotImplementedError guard ("needs PIL"); with
    # PIL installed the decode itself rejects non-image bytes ("cannot
    # identify image file"). Either way stub=False must fail loudly,
    # never silently fall back to the stub kernel.
    with pytest.raises(Exception, match="PIL|codec|identify"):
        extract_features(media, stub=False).collect()


def test_frame_sample(spark, media):
    import pyspark.sql.functions as F

    vids = media.withColumn(
        "meta", F.col("meta").withField("duration_ms", F.lit(3500).cast("long"))
    )
    frames = frame_sample(vids, every_ms=1000)
    per_media = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per_media)  # 3500 ms → frames at 0/1000/2000
    first = frames.filter(F.col("frame_ts_ms") == 0).first()
    assert isinstance(first.frame_bytes, (bytes, bytearray)) and len(first.frame_bytes) > 0


def test_media_features_query_pins_kernel_values(spark, sf_dir):
    """ADVICE r3: the registered q_media_features flattens features to
    f0..f15 with round(element_at(...i+1...)::double, 6). Pin BOTH the
    1-based indexing and the float32 re-rounding claim: each fi must
    equal round(v, 6) of the kernel's i-th feature for known docs."""
    from rt_bigdata_spark.operators.multimodal import _fake_features
    from rt_bigdata_spark.plans.textops import q_media_features
    from rt_bigdata_spark.sources.tables import load_table as lt

    docs = {r.doc_id: r.text for r in lt(spark, sf_dir, "documents").limit(5).collect()}
    out = {r.media_id: r for r in q_media_features(spark, sf_dir).collect() if r.media_id in docs}
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        expected = _fake_features(text.encode("utf-8"))
        row = out[doc_id]
        got = [row[f"f{i}"] for i in range(FEATURE_DIM)]
        assert got == [round(v, 6) for v in expected], f"doc {doc_id}"


def test_media_frames_query_pins_cadence_and_bytes(spark, sf_dir):
    """Sibling of the media_features value test: the registered
    q_media_frames is rows-only at the driver, so pin its semantics
    here — documents_as_media sets duration_ms=0, giving exactly ONE
    frame at ts 0 whose stub bytes are the first 16 bytes of the
    content; and a nonzero duration yields the 1s cadence."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.plans.textops import q_media_frames
    from rt_bigdata_spark.sources.tables import load_table as lt

    docs = {r.doc_id: r.text for r in lt(spark, sf_dir, "documents").limit(5).collect()}
    rows = [r for r in q_media_frames(spark, sf_dir).collect() if r.media_id in docs]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, frames in by_doc.items():
        assert len(frames) == 1  # duration 0 → single frame
        assert frames[0].frame_ts_ms == 0
        # registered surface is hex (driver-hashable); byte-wise slice
        assert frames[0].frame_hex == docs[doc_id].encode("utf-8")[:16].hex().upper()

    # nonzero duration: ceil-less cadence, duration//1000 frames
    from rt_bigdata_spark.operators.multimodal import documents_as_media, frame_sample

    media = documents_as_media(lt(spark, sf_dir, "documents").limit(3)).withColumn(
        "meta", F.col("meta").withField("duration_ms", F.lit(3500).cast("long"))
    )
    out = frame_sample(media, every_ms=1000)
    per = {r[0]: r[1] for r in out.groupBy("media_id").count().collect()}
    assert all(v == 3 for v in per.values())
    ts = sorted(r.frame_ts_ms for r in out.filter(F.col("media_id") == min(per)).collect())
    assert ts == [0, 1000, 2000]


def test_media_pseudo_embedding_deterministic_and_python_mirror(spark):
    import hashlib

    from rt_bigdata_spark.operators.multimodal import (
        documents_as_media,
        media_pseudo_embedding,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different")],
        "doc_id: long, text: string",
    )
    out = {(r.media_id, r.dim): r.val
           for r in media_pseudo_embedding(documents_as_media(docs), dim=4).collect()}

    def py_val(text, j):
        sig = hashlib.md5(text.encode()).hexdigest()
        h = int(hashlib.md5(f"{sig}:{j}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 1000.0

    for d, t in [(1, "hello world"), (2, "hello world"), (3, "different")]:
        for j in range(4):
            assert out[(d, j)] == py_val(t, j), (d, j)
    # identical bytes → identical vector (the dedup-relevant property)
    assert all(out[(1, j)] == out[(2, j)] for j in range(4))
    assert any(out[(1, j)] != out[(3, j)] for j in range(4))


def test_media_pseudo_embedding_zero_shuffle_no_python(spark):
    import contextlib
    import io

    from rt_bigdata_spark.operators.multimodal import (
        documents_as_media,
        media_pseudo_embedding,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        media_pseudo_embedding(documents_as_media(docs)).explain(mode="formatted")
    p = buf.getvalue()
    assert "hashpartitioning" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_media_pseudo_embedding_hoists_sig_and_rejects_bad_dim(spark):
    import contextlib
    import io

    import pytest as _pt

    from rt_bigdata_spark.operators.multimodal import (
        documents_as_media,
        media_pseudo_embedding,
    )

    docs = documents_as_media(spark.createDataFrame([(1, "x")], "doc_id: long, text: string"))
    with _pt.raises(ValueError, match="dim"):
        media_pseudo_embedding(docs, dim=0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        media_pseudo_embedding(docs, dim=16).explain(mode="formatted")
    p = buf.getvalue()
    # the content md5 must be materialized ONCE outside the transform
    # lambda (a captured expression re-evaluates per element: dim x
    # full-byte hashing otherwise)
    assert p.count("md5(content") <= 2, p  # tree + detail line of one node


def test_resize_media_stub_witness_and_codec_guard(spark, media):
    """resize_media: deterministic per-item resized-bytes witness
    (md5 chain keyed by content AND target dims), Arrow schema, and
    the stub=False real-codec guard."""
    import hashlib

    from rt_bigdata_spark.operators.multimodal import resize_media

    out = {r.media_id: r for r in resize_media(media, 32, 32).collect()}
    rows = {r.media_id: bytes(r.content) for r in media.collect()}
    assert set(out) == set(rows) and len(out) == 50
    for mid, raw in rows.items():
        r = out[mid]
        h = hashlib.md5(raw).hexdigest()
        assert r.resized_sig == hashlib.md5(f"{h}:32x32".encode()).hexdigest()
        assert (r.width, r.height, r.n_bytes) == (32, 32, len(raw))
    # different target dims → different witness (the dims are in the key)
    other = {r.media_id: r.resized_sig for r in resize_media(media, 64, 48).collect()}
    assert all(other[m] != out[m].resized_sig for m in out)

    import pytest as _pt

    # text bytes labeled "image": without PIL the import gate raises
    # ("needs PIL"); with PIL the decode rejects them ("cannot identify
    # image file") — stub=False must fail loudly either way.
    with _pt.raises(Exception, match="PIL|codec|identify"):
        resize_media(media, 32, 32, stub=False).collect()


# --- real audio decode: PCM WAV via stdlib wave (r12 verdict item 8) ---------


def _wav_bytes(pcm: bytes, channels: int = 1, rate: int = 8000, width: int = 2) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def test_audio_decode_real_wav_exact_bytes():
    """_decode_real('audio', …) returns the EXACT PCM sample bytes that
    were encoded (container-invariant canonical form) plus
    (channels, framerate); non-WAV bytes raise the honest guard."""
    import struct

    from rt_bigdata_spark.operators.multimodal import _decode_real

    pcm = struct.pack("<8h", 0, 1000, -1000, 32767, -32768, 42, -42, 0)
    wav = _wav_bytes(pcm, channels=1, rate=8000)
    decoded, dims = _decode_real("audio", wav)
    assert decoded == pcm
    assert dims == (1, 8000)

    # stereo round-trips too
    pcm2 = struct.pack("<8h", 1, 2, 3, 4, 5, 6, 7, 8)
    decoded2, dims2 = _decode_real("audio", _wav_bytes(pcm2, channels=2, rate=44100))
    assert decoded2 == pcm2 and dims2 == (2, 44100)

    with pytest.raises(NotImplementedError, match="PCM WAV only"):
        _decode_real("audio", b"\x00\x01not-a-riff-container")
    with pytest.raises(NotImplementedError, match="codec"):
        _decode_real("video", wav)


def test_audio_decode_malformed_riff_routes_to_guard():
    """stdlib wave raises EOFError on truncated chunks and struct.error
    on corrupt headers (not just wave.Error) — all malformed RIFF bytes
    must route through the same NotImplementedError contract so the
    Arrow kernels classify them as undecodable, not crash (r13 ADVICE
    low #3)."""
    import struct

    from rt_bigdata_spark.operators.multimodal import _decode_real

    pcm = struct.pack("<4h", 1, 2, 3, 4)
    wav = _wav_bytes(pcm)
    # truncate INSIDE the fmt chunk: wave gets a valid RIFF/WAVE magic
    # then hits EOF mid-chunk → EOFError from the chunk reader
    truncated = wav[:16]
    with pytest.raises(NotImplementedError, match="PCM WAV only"):
        _decode_real("audio", truncated)
    # corrupt the fmt chunk header size so struct unpacking misparses
    corrupt = bytearray(wav)
    corrupt[16:20] = b"\x02\x00\x00\x00"  # fmt chunk claims 2 bytes
    with pytest.raises(NotImplementedError, match="PCM WAV only"):
        _decode_real("audio", bytes(corrupt))


def test_audio_features_through_spark_real_path(spark):
    """stub=False over audio rows runs the real WAV decode inside the
    Arrow kernel: features equal _fake_features of the PCM bytes (not
    of the container bytes — a header change must not re-key), checked
    through the actual mapInPandas path."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.multimodal import _fake_features

    pcm = bytes(range(64))
    wav = _wav_bytes(pcm, channels=1, rate=16000)
    # same samples, different container framing: lower framerate only
    wav_other_rate = _wav_bytes(pcm, channels=1, rate=8000)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "audio", bytearray(wav_other_rate))],
        "media_id: long, media_type: string, content: binary",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(4).cast("long").alias("duration_ms"),
            F.lit("pcm_s16le").alias("codec"),
        ),
    )
    out = {r.media_id: list(r.features) for r in extract_features(media, stub=False).collect()}
    # FEATURES_SCHEMA stores float32 — compare at float32 precision
    expect = pytest.approx(_fake_features(pcm), abs=1e-7)
    assert out[1] == expect
    assert out[2] == expect  # container header differs, samples identical
    assert out[1] == out[2]  # ...so the keys are bit-identical


# --- real video container indexing: AVI/MJPEG via stdlib RIFF walk -----------
# (r13 verdict item 8 — the third _decode_real modality)


def _avi_bytes(frames: list[bytes], width: int = 4, height: int = 2,
               with_index: bool = True, extra_info: bool = False) -> bytes:
    """Minimal valid AVI muxer (stdlib struct): RIFF('AVI ' LIST hdrl
    (avih) LIST movi(00dc...) [idx1] [LIST INFO]). Enough container to
    pin the walker's canonical-form contract."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<10I", 33333, 0, 0, 0, len(frames), 0, 1, 0, width, height
    ) + b"\x00" * 16
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    movi = chunk(b"LIST", movi_body)
    idx = chunk(b"idx1", b"\x00" * (16 * len(frames))) if with_index else b""
    info = chunk(b"LIST", b"INFO" + chunk(b"ISFT", b"testmux\x00")) if extra_info else b""
    body = b"AVI " + hdrl + movi + idx + info
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_video_decode_avi_exact_frame_bytes():
    """_decode_real('video', …) returns the EXACT ordered frame payload
    bytes (container-invariant canonical form) plus (w, h, n_frames);
    re-muxing the same frames with no idx1 and extra INFO metadata
    decodes identically; non-AVI bytes raise the honest guard."""
    from rt_bigdata_spark.operators.multimodal import _decode_real

    frames = [b"\xff\xd8frame-one\xff\xd9", b"\xff\xd8frame-two!\xff\xd9"]
    avi = _avi_bytes(frames, width=6, height=4)
    decoded, dims = _decode_real("video", avi)
    assert decoded == b"".join(frames)
    assert dims == (6, 4, 2)

    # container-invariance: same frames, different muxer framing
    remuxed = _avi_bytes(frames, width=6, height=4, with_index=False, extra_info=True)
    assert remuxed != avi
    decoded2, dims2 = _decode_real("video", remuxed)
    assert decoded2 == decoded and dims2 == dims

    with pytest.raises(NotImplementedError, match="AVI/MJPEG"):
        _decode_real("video", b"\x00\x01not-a-riff")
    # a WAV is RIFF but not AVI — must route to the same guard
    with pytest.raises(NotImplementedError, match="AVI/MJPEG"):
        _decode_real("video", _wav_bytes(b"\x01\x00\x02\x00"))


def test_video_decode_multistream_avi_uses_first_vids_stream():
    """Multi-stream AVIs canonicalize over ONE stream — the first
    ``vids`` stream per the strh headers (r14 advice): a second
    stream's digit-numbered ``db``/``dc`` chunks neither inflate
    n_frames nor pollute the content-addressed dedup key, and when the
    video stream is not stream 00 its own index is selected."""
    import struct

    from rt_bigdata_spark.operators.multimodal import _decode_real

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def mux(stream_types: list[bytes], movi_chunks: list[tuple[bytes, bytes]],
            width: int = 6, height: int = 4) -> bytes:
        avih = struct.pack("<10I", 33333, 0, 0, 0, 2, 0, len(stream_types),
                           0, width, height) + b"\x00" * 16
        strls = b"".join(
            chunk(b"LIST", b"strl" + chunk(b"strh", fcc + b"\x00" * 52))
            for fcc in stream_types
        )
        hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strls)
        movi = chunk(b"LIST", b"movi" + b"".join(chunk(f, b) for f, b in movi_chunks))
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    vid = [b"\xff\xd8frame-one\xff\xd9", b"\xff\xd8frame-two!\xff\xd9"]
    other = [b"subtitle-blob-1!", b"subtitle-blob-2!"]

    # stream 0 = vids, stream 1 = non-video digit-numbered chunks:
    # interleaved 01db payloads are excluded from the canonical form
    avi = mux([b"vids", b"txts"],
              [(b"00dc", vid[0]), (b"01db", other[0]),
               (b"00dc", vid[1]), (b"01db", other[1])])
    decoded, dims = _decode_real("video", avi)
    assert decoded == b"".join(vid)
    assert dims == (6, 4, 2)

    # audio-first layout: the vids stream is 01 — its chunks are chosen
    avi2 = mux([b"auds", b"vids"],
               [(b"00dc", other[0]), (b"01dc", vid[0]),
                (b"00dc", other[1]), (b"01dc", vid[1])])
    decoded2, dims2 = _decode_real("video", avi2)
    assert decoded2 == b"".join(vid)
    assert dims2 == (6, 4, 2)

    # the single-stream muxes above and the strh-less _avi_bytes form
    # must agree on the canonical payload (fallback stream = 00)
    assert decoded == _decode_real("video", _avi_bytes(vid, width=6, height=4))[0]


def test_video_decode_malformed_avi_routes_to_guard():
    """Truncated movi chunks and short avih headers route through the
    NotImplementedError contract, not raw struct/EOF errors."""
    from rt_bigdata_spark.operators.multimodal import _decode_real

    avi = _avi_bytes([b"\xff\xd8payload\xff\xd9"])
    with pytest.raises(NotImplementedError, match="AVI/MJPEG"):
        _decode_real("video", avi[:40])  # truncated inside hdrl
    # corrupt a frame chunk size so it overruns the container
    import struct

    pos = avi.index(b"00dc") + 4
    corrupt = avi[:pos] + struct.pack("<I", 1 << 30) + avi[pos + 4:]
    with pytest.raises(NotImplementedError, match="AVI/MJPEG"):
        _decode_real("video", corrupt)


def test_video_features_through_spark_real_path(spark):
    """stub=False over video rows runs the real AVI indexing inside the
    Arrow kernel: features equal _fake_features of the concatenated
    frame payloads (not the container bytes)."""
    from rt_bigdata_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _fake_features,
        extract_features,
    )

    frames = [b"\xff\xd8abc\xff\xd9", b"\xff\xd8defg\xff\xd9"]
    avi = _avi_bytes(frames)
    rows = [(1, "video", bytearray(avi), {"duration_ms": 66})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(media, stub=False).collect()
    assert len(out) == 1
    # FEATURES_SCHEMA stores float32 — compare at float32 precision
    assert out[0].features == pytest.approx(_fake_features(b"".join(frames)), abs=1e-7)
    assert out[0].n_bytes == len(avi)


def test_decode_media_operator_canonical_rows(spark):
    """decode_media (r14 verdict item 5): the real decode layer as an
    operator — stereo WAV dims land as (dim0=channels, dim1=rate,
    dim2=null), AVI dims as (w, h, n_frames), canonical_hex is the
    encoding-invariant payload hex (two containers of the same PCM
    collide), and n_bytes counts the CANONICAL bytes, not the
    container's."""
    from rt_bigdata_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    pcm = b"\x01\x02\x03\x04\x05\x06\x07\x08"
    frames = [b"\xff\xd8abc\xff\xd9", b"\xff\xd8defg\xff\xd9"]
    rows = [
        (1, "audio", bytearray(_wav_bytes(pcm, channels=2, rate=44100)), None),
        (2, "audio", bytearray(_wav_bytes(pcm, channels=1, rate=8000)), None),
        (3, "video", bytearray(_avi_bytes(frames, width=6, height=4)), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in decode_media(media).collect()}

    assert (out[1].dim0, out[1].dim1, out[1].dim2) == (2, 44100, None)
    assert (out[2].dim0, out[2].dim1, out[2].dim2) == (1, 8000, None)
    # same PCM under different container params → same canonical key
    assert out[1].canonical_hex == out[2].canonical_hex == pcm.hex()
    assert out[1].n_bytes == len(pcm)

    assert (out[3].dim0, out[3].dim1, out[3].dim2) == (6, 4, 2)
    assert out[3].canonical_hex == b"".join(frames).hex()
