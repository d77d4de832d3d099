"""Multimodal binary-column plumbing: schemas, Arrow batch shape, stubbed
codec determinism, resize/frame-sample stages."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_rags_spark.multimodal.codecs import (
    attach_fake_image_payload,
    decode_payload,
    frame_sample,
    image_features,
    resize_images,
)


@pytest.fixture(scope="module")
def images(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    return attach_fake_image_payload(docs)


def test_payload_schema(images):
    assert dict(images.dtypes)["payload"] == "binary"
    assert "width" in images.schema["meta"].dataType.fieldNames()


def test_decode_stub_is_deterministic_and_marked():
    img = decode_payload(b"hello world bytes", 4, 4)
    assert img.shape == (4, 4) and img.dtype == np.uint8
    assert (img == decode_payload(b"hello world bytes", 4, 4)).all()
    with pytest.raises(NotImplementedError, match="not implemented"):
        decode_payload(b"...", 2, 2, fmt="image/jpeg")


def test_png_codec_round_trips():
    # REAL format end-to-end (VERDICT r2 #6): encode a known grid, decode it
    # back bit-exactly through the codec-registry seam
    from bigdata_rags_spark.multimodal.codecs import decode_png, encode_png

    rng = np.arange(7 * 5, dtype=np.uint8).reshape(5, 7) * 3 % 251
    png = encode_png(rng)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert (decode_png(png) == rng).all()
    assert (decode_payload(png, 7, 5, fmt="image/png") == rng).all()
    with pytest.raises(ValueError, match="metadata says"):
        decode_payload(png, 5, 7, fmt="image/png")


def test_png_unfilter_all_filter_types():
    # hand-build scanline streams using each PNG filter type and check the
    # decoder reconstructs the same image the filter was derived from
    import struct
    import zlib

    from bigdata_rags_spark.multimodal.codecs import decode_png

    img = (np.arange(4 * 4, dtype=np.uint8).reshape(4, 4) * 17) % 256

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png_with_filters(filter_types):
        rows = []
        prev = np.zeros(4, dtype=np.int32)
        for y, ft in enumerate(filter_types):
            cur = img[y].astype(np.int32)
            if ft == 0:
                enc = cur.copy()
            elif ft == 1:  # Sub
                enc = cur.copy()
                enc[1:] = (cur[1:] - cur[:-1]) % 256
            elif ft == 2:  # Up
                enc = (cur - prev) % 256
            elif ft == 3:  # Average
                enc = cur.copy()
                for x in range(4):
                    left = int(cur[x - 1]) if x else 0
                    enc[x] = (int(cur[x]) - (left + int(prev[x])) // 2) % 256
            elif ft == 4:  # Paeth
                enc = cur.copy()
                for x in range(4):
                    a = int(cur[x - 1]) if x else 0
                    b = int(prev[x])
                    c = int(img[y - 1, x - 1]) if (x and y) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (int(cur[x]) - pred) % 256
            rows.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(rows)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    assert (decode_png(png_with_filters([0, 1, 2, 3])) == img).all()
    assert (decode_png(png_with_filters([4, 4, 1, 2])) == img).all()


def test_image_features_on_real_png_payloads(spark):
    # the Spark pipeline itself over a REAL format: payloads are PNG bytes,
    # meta.format = image/png, and the decoded mean matches numpy's
    from bigdata_rags_spark.multimodal.codecs import encode_png

    grids = {i: ((np.arange(6 * 6) * (i + 3)) % 256).astype(np.uint8).reshape(6, 6) for i in range(5)}
    rows = [
        (i, bytearray(encode_png(g)), {"width": 6, "height": 6, "channels": 1, "format": "image/png"})
        for i, g in grids.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, meta struct<width:int,height:int,channels:int,format:string>"
    )
    feats = {r["doc_id"]: r for r in image_features(df).collect()}
    assert len(feats) == 5
    for i, g in grids.items():
        assert feats[i]["mean_byte"] == round(float(g.astype(np.float64).mean()), 6)


def test_image_features_batch(images):
    feats = image_features(images)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["n_bytes"] > 0 and 0 <= r["mean_byte"] <= 255 and r["std_byte"] >= 0
    # deterministic across runs
    again = {x["doc_id"]: x["mean_byte"] for x in image_features(images).collect()}
    assert again[r["doc_id"]] == r["mean_byte"]


def test_resize_produces_fixed_dims(spark, images):
    resized = resize_images(images, 8, 6)
    rows = resized.collect()
    assert all(len(bytes(r["payload"])) == 8 * 6 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 6 for r in rows)
    # resized payloads decode through the same stub
    feats = image_features(resized).collect()
    assert all(f["width"] == 8 for f in feats)


def test_frame_sample_keeps_every_kth(images):
    frames = frame_sample(images, every_k=4, frame_bytes=16)
    per_doc = {}
    for r in frames.collect():
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
        assert len(bytes(r["frame_payload"])) <= 16
    assert per_doc, "no frames sampled"
    for frames_list in per_doc.values():
        assert all(f % 4 == 0 for f in frames_list)

def test_audio_features_and_stub_contract(spark, sf_smoke):
    import math

    import numpy as np
    import pytest

    from bigdata_rags_spark.io.readers import read_testdata
    from bigdata_rags_spark.multimodal.codecs import (
        attach_fake_audio_payload,
        audio_features,
        decode_audio,
    )

    docs = read_testdata(spark, sf_smoke, "documents")["documents"].limit(20)
    clips = attach_fake_audio_payload(docs)
    feats = {r["doc_id"]: r for r in audio_features(clips, window=8).collect()}
    assert len(feats) == 20
    for r in feats.values():
        assert 0.0 <= r["rms"] <= 1.0 and 0.0 <= r["peak"] <= 1.0
        assert 0.0 <= r["zero_cross_rate"] <= 1.0
        assert r["n_windows"] == math.ceil(r["n_samples"] / 8)
        assert r["sample_rate"] == 16_000
    # the decode stub: known PCM round-trips exactly; real codecs raise
    pcm = np.array([0, 16384, -16384, 32767], dtype="<i2").tobytes()
    x = decode_audio(pcm)
    assert np.allclose(x, [0.0, 0.5, -0.5, 32767 / 32768])
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x00", codec="audio/mp3")


def test_wav_payloads_are_real_riff_and_features_exact(spark, sf_smoke):
    """VERDICT r4 #6 closure: multimodal_wav_features pushes genuine
    RIFF/WAVE bytes through the stdlib codec.  Assert the payloads really
    are WAV files, and the decoded features match an independent pure-python
    recomputation of the deterministic PCM signal."""
    import math

    import numpy as np

    from bigdata_rags_spark.multimodal.codecs import attach_wav_payload, decode_wav
    from bigdata_rags_spark.queries.catalog import REGISTRY

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(5)
    rows = attach_wav_payload(docs).collect()
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        x, rate = decode_wav(payload)
        assert rate == 16_000 and r["meta"]["codec"] == "audio/wav"
        pcm = np.rint(x * 32768.0).astype(np.int64)
        n = pcm.size
        want = ((r["doc_id"] * 31 + np.arange(n, dtype=np.int64) * 25173) % 65536) - 32768
        assert (pcm == want).all(), r["doc_id"]

    feats = {
        r["doc_id"]: r
        for r in REGISTRY["multimodal_wav_features"].spark(spark, sf_smoke).collect()
    }
    for r in rows:
        pcm = np.rint(decode_wav(bytes(r["payload"]))[0] * 32768.0).astype(np.int64)
        f = feats[r["doc_id"]]
        assert f["n_samples"] == pcm.size
        assert f["peak_abs"] == int(np.abs(pcm).max())
        assert f["n_zero_cross"] == int(((pcm[1:] < 0) != (pcm[:-1] < 0)).sum())
        sum_sq = int((pcm * pcm).sum())
        assert f["rms"] == math.floor(
            math.sqrt(sum_sq / pcm.size) / 32768.0 * 1_000_000.0
        ) / 1e6


def test_png_payloads_are_real_png_and_features_exact(spark, sf_smoke):
    """VERDICT r5 #3 closure: multimodal_png_features pushes genuine PNG
    bytes through the pure-python codec.  Assert the payloads really are
    PNG files, and the decoded features match an independent pure-python
    recomputation of the deterministic pixel grid."""
    import numpy as np

    from bigdata_rags_spark.multimodal.codecs import attach_png_payload, decode_png
    from bigdata_rags_spark.queries.catalog import REGISTRY

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(5)
    rows = attach_png_payload(docs).collect()
    assert rows
    grids = {}
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        img = decode_png(payload)
        w, h = r["meta"]["width"], r["meta"]["height"]
        assert img.shape == (h, w) and r["meta"]["format"] == "image/png"
        i = np.arange(w * h, dtype=np.int64)
        want = ((r["doc_id"] * 31 + i * 97) % 256).reshape(h, w)
        assert (img.astype(np.int64) == want).all(), r["doc_id"]
        grids[r["doc_id"]] = want

    feats = {
        r["doc_id"]: r
        for r in REGISTRY["multimodal_png_features"].spark(spark, sf_smoke).collect()
    }
    for doc_id, img in grids.items():
        f = feats[doc_id]
        h, w = img.shape
        assert (f["width"], f["height"], f["n_pixels"]) == (w, h, w * h)
        assert f["sum_pix"] == int(img.sum())
        assert f["mean_micro"] == int(img.sum()) * 1_000_000 // (w * h)
        assert (f["max_pix"], f["min_pix"]) == (int(img.max()), int(img.min()))
        assert f["n_h_edges"] == int((np.abs(np.diff(img, axis=1)) >= 64).sum())
        assert f["n_v_edges"] == int((np.abs(np.diff(img, axis=0)) >= 64).sum())
        assert f["n_h_edges"] > 0 and f["n_v_edges"] > 0  # non-vacuous edges


def test_audio_fingerprint_gain_invariance_and_near_dup(spark):
    """The fingerprint keys on energy-transition SIGNS: a half-gain copy of
    a clip fingerprints identically (hamming 0), while a clip with reversed
    frame-energy ramps differs in most bits."""
    import numpy as np
    from pyspark.sql import functions as F

    from bigdata_rags_spark.multimodal.codecs import (
        audio_fingerprint63,
        encode_wav,
    )

    rng = np.arange(256, dtype=np.int64)
    ramp_up = ((rng * 111) % 8000 + rng * 60 - 16000)      # rising energy
    ramp_dn = ramp_up[::-1].copy()                          # falling energy
    rows = [
        (1, encode_wav(ramp_up / 32768.0)),
        (2, encode_wav((ramp_up // 2) / 32768.0)),          # half gain
        (3, encode_wav(ramp_dn / 32768.0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.expr(
            "named_struct('sample_rate', 16000, 'channels', 1,"
            " 'codec', 'audio/wav')"
        ).alias("meta"),
    )
    fp = {r["doc_id"]: r["fp"] for r in audio_fingerprint63(df).collect()}
    assert fp[1] == fp[2]                       # gain-invariant
    assert bin(fp[1] ^ fp[3]).count("1") > 7    # reversed ramp: not a near-dup

def test_audio_fingerprint126_gain_invariance_and_width(spark):
    """The 126-bit widening keeps the Haitsma-Kalker sign property (half
    gain => identical fingerprint) and each half stays below 2^63 so band
    shifts never touch a sign bit."""
    import numpy as np
    from pyspark.sql import functions as F

    from bigdata_rags_spark.multimodal.codecs import (
        audio_fingerprint126,
        encode_wav,
    )

    rng = np.arange(256, dtype=np.int64)
    ramp_up = (rng * 111) % 8000 + rng * 60 - 16000
    ramp_dn = ramp_up[::-1].copy()
    rows = [
        (1, encode_wav(ramp_up / 32768.0)),
        (2, encode_wav((ramp_up // 2) / 32768.0)),
        (3, encode_wav(ramp_dn / 32768.0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.expr(
            "named_struct('sample_rate', 16000, 'channels', 1,"
            " 'codec', 'audio/wav')"
        ).alias("meta"),
    )
    fp = {r["doc_id"]: (r["fp_lo"], r["fp_hi"]) for r in audio_fingerprint126(df).collect()}
    assert fp[1] == fp[2]                       # gain-invariant
    assert all(0 <= half < 2**63 for pair in fp.values() for half in pair)
    dist = bin(fp[1][0] ^ fp[3][0]).count("1") + bin(fp[1][1] ^ fp[3][1]).count("1")
    assert dist > 7                             # reversed ramp: not a near-dup


def test_image_ahash128_replays_integer_rule(spark):
    """image_ahash128 over a resized 16x8 grid equals the numpy replay of
    the exact ``pix * 128 >= sum`` rule, word-packed bits [32j, 32j+32)."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.multimodal.codecs import image_ahash128

    d, n = 7, 128
    grid = ((d * 31 + np.arange(n, dtype=np.int64) * 97) % 256).astype(np.uint8)
    df = spark.createDataFrame([(d, bytes(grid.tobytes()))], "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.expr(
            "named_struct('width', 16, 'height', 8, 'channels', 1, 'format', 'fake/raw')"
        ).alias("meta"),
    )
    row = image_ahash128(df).collect()[0]
    bits = grid.astype(np.int64) * 128 >= int(grid.sum())
    for j in range(4):
        expect = sum(1 << i for i in range(32) if bits[32 * j + i])
        assert row[f"w{j}"] == expect


def test_video_temporal_fingerprint_replay_and_tolerance(spark):
    """video_temporal_fingerprint128: (a) equals the python replay of the
    segment-sum + v*128>=total rule, (b) identical clips hash identically,
    (c) a localized edit flips <= 7 bits (inside the banded-join threshold),
    (d) small shifts/truncations degrade gracefully (well below the random
    baseline, the documented TIRI tradeoff), (e) partitioning-invariant."""
    import hashlib

    from pyspark.sql import functions as F

    from bigdata_rags_spark.multimodal.codecs import video_temporal_fingerprint128

    def hx(seed, n):
        out, i = [], 0
        while sum(len(x) for x in out) < n:
            out.append(hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    A = hx("clipA", 2048)
    clips = {
        1: A,
        2: A,                                # exact copy
        3: A[:1000] + "fff" + A[1003:],      # 3-char local edit
        4: "deadbeef" + A,                   # 8-char front shift
        5: A[:2040],                         # tail truncation
        6: hx("clipD", 2048),                # unrelated
    }
    df = spark.createDataFrame(list(clips.items()), ["doc_id", "t"]).select(
        "doc_id", F.col("t").cast("binary").alias("payload")
    )

    def replay(s):
        L = len(s)
        vals = [0] * 128
        for j, c in enumerate(s):
            vals[(j * 128) // L] += ord(c)
        total = sum(vals)
        bits = [1 if v * 128 >= total else 0 for v in vals]
        return tuple(
            sum(b << i for i, b in enumerate(bits[32 * j : 32 * j + 32]))
            for j in range(4)
        )

    for n_parts in (1, 5):
        got = {
            r["doc_id"]: (r["w0"], r["w1"], r["w2"], r["w3"])
            for r in video_temporal_fingerprint128(df.repartition(n_parts)).collect()
        }
        assert got == {d: replay(s) for d, s in clips.items()}

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(got[a], got[b]))

    assert ham(1, 2) == 0                     # exact copy
    assert ham(1, 3) <= 7                     # local edit stays joinable
    assert ham(1, 4) < 32 and ham(1, 5) < 32  # shifts: graceful degradation
    assert ham(1, 6) > 45                     # unrelated: near-random distance


def test_multimodal_capstone_probe_finds_planted_identical_image(spark):
    """VERDICT r13 #3 needle: attach_png_payload's pixel is
    (doc_id*31 + i*97) % 256, so two docs 256 apart in id with equal
    n_chars synthesize IDENTICAL PNGs — the probe must retrieve the twin
    at rank 1 / hamming 0, and unrelated images must not appear at
    hamming <= 7 unless genuinely close."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.multimodal.codecs import (
        attach_png_payload,
        image_ahash128,
        resize_images,
    )
    from bigdata_rags_spark.dedup.hamming import banded_hamming_probe

    rows = [
        (1000, 57),   # query
        (1256, 57),   # planted twin: same grid, (1256-1000)*31 % 256 == 0
        (2001, 91),
        (3002, 33),
        (4003, 70),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    h = image_ahash128(
        resize_images(attach_png_payload(docs), out_w=16, out_h=8)
    ).localCheckpoint()
    hits = banded_hamming_probe(
        h.filter(F.col("doc_id") == 1000), h, max_hamming=7, k=5
    ).collect()
    assert len(hits) >= 1
    top = next(r for r in hits if r["rank"] == 1)
    assert (top["match_doc"], top["hamming"]) == (1256, 0)
    # symmetry: the twin as query finds the original at rank 1
    back = banded_hamming_probe(
        h.filter(F.col("doc_id") == 1256), h, max_hamming=7, k=5
    ).collect()
    assert next(r for r in back if r["rank"] == 1)["match_doc"] == 1000


def test_banded_hamming_rejects_lossy_threshold(spark):
    """The pigeonhole guarantee is a precondition, not a hope: asking for
    max_hamming > bands-1 must raise instead of silently going lossy."""
    import pytest as _pytest

    from bigdata_rags_spark.dedup.hamming import (
        banded_hamming_pairs,
        banded_hamming_probe,
    )

    h = spark.createDataFrame(
        [(1, 0, 0, 0, 0)], ["doc_id", "w0", "w1", "w2", "w3"]
    )
    with _pytest.raises(ValueError):
        banded_hamming_pairs(h, max_hamming=8)
    with _pytest.raises(ValueError):
        banded_hamming_probe(h, h, max_hamming=8)


def test_banded_hamming_pairs_equals_brute_force(spark):
    """The banded plan must equal the all-pairs Hamming predicate on a
    corpus with planted near/far pairs, for both the 128-bit w0..w3 layout
    and the 126-bit audio layout."""
    from itertools import combinations

    from bigdata_rags_spark.dedup.hamming import (
        FP126_BAND_EXPRS,
        banded_hamming_pairs,
    )

    rows = [
        (1, 0b1111, 0, 0, 0),
        (2, 0b1011, 0, 0, 0),          # hamming 1 from doc 1
        (3, 0, 0xFFFF, 0, 0),          # far from 1/2
        (4, 0, 0xFF1F, 0, 0),          # hamming 3 from doc 3
        (5, 123456, 654321, 111, 222), # isolated
    ]
    h = spark.createDataFrame(rows, ["doc_id", "w0", "w1", "w2", "w3"])
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in banded_hamming_pairs(h).collect()
    }
    exp = {}
    for (ia, *wa), (ib, *wb) in combinations(rows, 2):
        d = sum(bin(a ^ b).count("1") for a, b in zip(wa, wb))
        if d <= 7:
            exp[(ia, ib)] = d
    assert got == exp
    # audio layout: same contract over (fp_lo, fp_hi)
    arows = [(1, 0b111, 0), (2, 0b100, 0), (3, 1 << 50, 1 << 40)]
    ah = spark.createDataFrame(arows, ["doc_id", "fp_lo", "fp_hi"])
    agot = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in banded_hamming_pairs(ah, ["fp_lo", "fp_hi"], FP126_BAND_EXPRS).collect()
    }
    aexp = {}
    for (ia, la, hb_), (ib, lb, hb2) in combinations(arows, 2):
        d = bin(la ^ lb).count("1") + bin(hb_ ^ hb2).count("1")
        if d <= 7:
            aexp[(ia, ib)] = d
    assert agot == aexp


def test_video_probe_retrieves_identical_clip(spark):
    """Video-capstone needle (VERDICT r15 next #3's done-criterion): two
    docs with byte-identical clip payloads (the temporal fingerprint is a
    pure function of the hex payload) must find each other at rank 1 /
    hamming 0, in both directions — through the SHARED banded probe in its
    default 128-bit w0..w3 layout."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.dedup.hamming import banded_hamming_probe
    from bigdata_rags_spark.multimodal.codecs import video_temporal_fingerprint128

    rows = [
        (10, "the quick brown fox jumps over the lazy dog again and again"),
        (70, "the quick brown fox jumps over the lazy dog again and again"),
        (21, "completely different clip content with other byte statistics"),
        (32, "a third unrelated clip whose segments sum to something else"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    payload = docs.select(
        "doc_id", F.hex(F.col("text").cast("binary")).cast("binary").alias("payload")
    )
    h = video_temporal_fingerprint128(payload).localCheckpoint()
    for qid, twin in ((10, 70), (70, 10)):
        hits = banded_hamming_probe(
            h.filter(F.col("doc_id") == qid), h, max_hamming=7, k=5
        ).collect()
        top = next(r for r in hits if r["rank"] == 1)
        assert (top["match_doc"], top["hamming"]) == (twin, 0)


def test_audio_probe_retrieves_identical_clip(spark):
    """Audio-capstone needle (VERDICT r14 next #7's done-criterion): two
    docs whose synthesized WAV params collide EXACTLY — a = abs((doc_id*31
    + i*25173) % 65536 - 32768), so doc_id and doc_id + 65536 with equal
    n_chars produce identical clips — must find each other at rank 1 /
    hamming 0, in both directions."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.dedup.hamming import (
        FP126_BAND_EXPRS,
        banded_hamming_probe,
    )
    from bigdata_rags_spark.multimodal.codecs import (
        attach_wav_payload,
        audio_fingerprint126,
    )

    rows = [
        (1000, 57),    # query clip
        (66536, 57),   # planted twin: 1000 + 65536, same n_chars
        (2001, 91),
        (3002, 33),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    h = audio_fingerprint126(attach_wav_payload(docs)).localCheckpoint()
    for qid, twin in ((1000, 66536), (66536, 1000)):
        hits = banded_hamming_probe(
            h.filter(F.col("doc_id") == qid), h,
            ["fp_lo", "fp_hi"], FP126_BAND_EXPRS, max_hamming=7, k=5,
        ).collect()
        top = next(r for r in hits if r["rank"] == 1)
        assert (top["match_doc"], top["hamming"]) == (twin, 0)
