"""Data-pipeline operators: dedup / text / vector / multimodal sanity.

Exact-value parity with DuckDB is covered by tools/check_correctness.py and
the driver's oracle gate; these tests pin semantic invariants instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_framework_spark.catalog import load_table
from spark_etl_framework_spark.operators import dedup as D
from spark_etl_framework_spark.operators import text as T
from spark_etl_framework_spark.operators import vector as V
from spark_etl_framework_spark.operators.multimodal import (
    decode_images,
    sample_audio_frames,
)


def test_exact_dedup_flags_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "hello world"), (3, "other text")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.exact_dedup(df).collect()}
    # whitespace-normalized: 1 and 2 are the same group; min id kept
    assert out[1]["is_kept"] and not out[2]["is_kept"]
    assert out[1]["group_size"] == 2 and out[3]["group_size"] == 1


def test_word_shingles_counts(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    got = {r["shingle"] for r in D.word_shingles(df, n=3).collect()}
    assert got == {"a b c", "b c d"}


def test_ngram_jaccard_max_df_drops_hot_shingle(spark):
    """A degenerate shingle present in every document must not dominate the
    inverted-index join once the max_df cap is engaged. Docs 1/2 share a
    unique tail ('x y z'); all four share the boilerplate head ('spam spam
    spam'). Capped at max_df=3 the boilerplate shingle (df=4) is dropped, so
    only the 1-2 pair survives with Jaccard over the remaining shingles."""
    rows = [
        (1, "spam spam spam x y z"),
        (2, "spam spam spam x y z"),
        (3, "spam spam spam p q r"),
        (4, "spam spam spam k l m"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = D.ngram_jaccard_topk(df, n=3, k=10, max_df=3).collect()
    # 'spam spam spam' (df=4) is gone; docs 3/4 share nothing else, so the
    # only emitted pair is (1,2), and it's a perfect match on what remains
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(1, 2)]
    assert capped[0]["jaccard"] == 1.0

    uncapped = D.ngram_jaccard_topk(df, n=3, k=10).collect()
    # without the cap every pair matches via the boilerplate shingle
    assert len(uncapped) == 6


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different words in this one here now ok")],
        ["doc_id", "text"],
    )
    sig = D.minhash_signatures(D.word_shingles(df), k=8)
    rows = sig.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[1] == by_doc[2] != by_doc[3]
    # and LSH pairs them
    pairs = D.lsh_candidate_pairs(D.lsh_bands(sig)).collect()
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2) and len(pairs) == 1


def test_simhash_close_for_similar_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta iota"),
         (3, "one two three four five six seven eight")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["simhash"] for r in D.simhash16(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_language_id_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog"),
         (2, "der hund ist ein tier und das ist gut"),
         (3, "xyzzy plugh qwerty")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in T.with_language_id(df).collect()}
    assert out[1]["pred_lang"] == "en"
    assert out[2]["pred_lang"] == "de"
    assert out[3]["pred_lang"] == "und"
    q = {r["doc_id"]: r["quality_score"] for r in T.with_quality_score(df).collect()}
    assert 0 <= q[3] < q[1] <= 1


def test_cosine_topk_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(10_000))
    corpus = emb.unionByName(dup)
    probes = emb.filter(F.col("vec_id") == 0)
    top = V.cosine_topk(corpus, probes, k=3).collect()
    # the duplicated vector is the top neighbour with cosine 1.0
    assert top[0]["vec_id"] == 10_000 and abs(top[0]["cosine"] - 1.0) < 1e-9
    assert all(t["cosine"] <= 1.000001 for t in top)


def test_multimodal_decode_stub_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"fake-image-bytes-1")), (2, bytearray(b"fake-image-bytes-2"))],
        "id long, payload binary",
    )
    out = decode_images(df, fake=True).collect()
    assert {r["id"] for r in out} == {1, 2}
    for r in out:
        assert len(r["pixels"]) == r["width"] * r["height"] * r["channels"]
    frames = sample_audio_frames(df, n_frames=3, frame_bytes=4, fake=True).collect()
    assert len(frames) == 6  # 2 docs × 3 frames
    assert all(len(r["frame"]) == 4 for r in frames)


def test_multimodal_decode_compressed_formats_still_gated(spark):
    """Unknown magic still raises with the codec inventory named; and
    the native compressed decoders (PNG/JPEG since round 7) must fail
    LOUDLY on truncated payloads, never quietly wrong."""
    import pytest

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x01\xbampeg-ps"))], "id long, payload binary"
    )
    with pytest.raises(Exception, match="no codec for magic"):
        decode_images(df, fake=False).collect()
    tdf = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nrest"))], "id long, payload binary"
    )
    with pytest.raises(Exception, match="missing IHDR"):
        decode_images(tdf, fake=False).collect()
    jdf = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xd9"))], "id long, payload binary"
    )
    with pytest.raises(Exception, match="missing SOF0 or SOS"):
        decode_images(jdf, fake=False).collect()
    adf = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04mp3-ish"))], "id long, payload binary"
    )
    with pytest.raises(Exception, match="no codec for audio magic"):
        sample_audio_frames(adf, fake=False).collect()


def test_multimodal_netpbm_real_decode_and_resize(spark):
    """Real P6/P5 parsing: dims from the ASCII header (comments included),
    raster bytes verbatim; nearest-neighbor resize doubles each pixel of a
    2x1 image into a 4x2 block pattern."""
    px = bytes(range(6))  # 2x1 RGB: pixel A=(0,1,2), B=(3,4,5)
    p6 = b"P6\n# a comment\n2 1\n255\n" + px
    pgm = b"P5\n3 2\n255\n" + bytes(range(6))
    df = spark.createDataFrame(
        [(1, bytearray(p6)), (2, bytearray(pgm))], "id long, payload binary"
    )
    out = {r["id"]: r for r in decode_images(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (2, 1, 3)
    assert out[1]["format"] == "ppm/rgb8" and bytes(out[1]["pixels"]) == px
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (3, 2, 1)
    assert out[2]["format"] == "pgm/gray8"
    rdf = spark.createDataFrame([(1, bytearray(p6))], "id long, payload binary")
    r = decode_images(rdf, fake=False, resize=(4, 2)).collect()[0]
    assert (r["width"], r["height"]) == (4, 2)
    a, b = px[:3], px[3:]
    assert bytes(r["pixels"]) == (a + a + b + b) * 2  # each pixel -> 2x2 block


def _rle8_bmp(w, h, palette, stream, clr_used=None):
    """Assemble an 8-bit BI_RLE8 BMP from (r,g,b) palette entries and a
    raw RLE packet stream (pure struct — independent of the decoder)."""
    import struct

    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    if clr_used is None:
        clr_used = len(palette)
    data_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(stream), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream), 0, 0, clr_used, 0
    )
    return hdr + info + pal + stream


def test_multimodal_bmp_rle8_absolute_delta_and_errors():
    """_decode_bmp_rle8 beyond the oracle query's run packets: absolute
    mode (with its word-boundary padding byte), delta jumps (skipped
    pixels = index 0), bottom-up flip, and the loud-failure paths
    (truncated stream, overflowing run, out-of-range palette index)."""
    import pytest

    from spark_etl_framework_spark.operators.multimodal import _decode_bmp_rle8

    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    # 5x2, bottom-up. Stored row 0 (display row 1): run 2x pal[1], then
    # an ABSOLUTE run (count >= 3 — count 2 would be the delta escape) of
    # indices 2,3,2 plus its odd-count word-padding byte. Stored row 1
    # (display row 0): a delta skip of 1 column (skipped pixel = index 0)
    # then run 4x pal[2].
    stream = bytes(
        [2, 1]  # run: 2 pixels of palette[1]
        + [0, 3, 2, 3, 2, 0]  # absolute: indices 2,3,2 + pad byte
        + [0, 0]  # end of line
        + [0, 2, 1, 0]  # delta: skip 1 right
        + [4, 2]  # run: 4 pixels of palette[2]
        + [0, 1]  # end of bitmap
    )
    fmt, w, h, c, px = _decode_bmp_rle8(_rle8_bmp(5, 2, pal, stream))
    assert (fmt, w, h, c) == ("bmp/rle8", 5, 2, 3)
    rows = [px[i * 15 : (i + 1) * 15] for i in range(2)]
    # display row 0 = stored row 1: [pal0 (delta-skipped), pal2 x4]
    assert rows[0] == bytes((10, 20, 30) + (70, 80, 90) * 4)
    # display row 1 = stored row 0: [pal1, pal1, pal2, pal3, pal2]
    assert rows[1] == bytes(
        (40, 50, 60) * 2
        + (70, 80, 90)
        + (100, 110, 120)
        + (70, 80, 90)
    )

    # absolute run with ODD length consumes a padding byte
    stream_odd = bytes([0, 3, 1, 2, 3, 0] + [0, 0] + [4, 0] + [0, 1])
    fmt2, _, _, _, px2 = _decode_bmp_rle8(_rle8_bmp(4, 2, pal, stream_odd))
    assert px2[12 + 0 : 12 + 9] == bytes((40, 50, 60) + (70, 80, 90) + (100, 110, 120))

    with pytest.raises(ValueError, match="truncated RLE8"):
        _decode_bmp_rle8(_rle8_bmp(4, 2, pal, bytes([2, 1])))
    with pytest.raises(ValueError, match="overflows row"):
        _decode_bmp_rle8(_rle8_bmp(4, 2, pal, bytes([5, 1, 0, 1])))
    with pytest.raises(ValueError, match="palette index out of range"):
        _decode_bmp_rle8(_rle8_bmp(4, 2, pal, bytes([2, 9, 0, 1])))


def _lzw_encode(indices, min_code):
    """Real GIF LZW encoder (test-side only): clear, greedy longest-match
    codes with dynamic table growth and width bumps, end-of-information;
    LSB-first bit packing — the encoder half the repo deliberately does
    not ship, used to prove the decoder's growth paths."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bits: list[int] = []
    width = min_code + 1

    def emit(code):
        for b in range(width):
            bits.append((code >> b) & 1)

    table = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    emit(clear)
    cur = b""
    for ix in indices:
        nxt = cur + bytes([ix])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # encoder bumps one entry AFTER the decoder's threshold —
            # the classic off-by-one both sides must agree on
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = bytes([ix])
    if cur:
        emit(table[cur])
    emit(eoi)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data)


def _gif(w, h, palette, indices, min_code=3, interlaced=False, data=None):
    import struct

    nbits = max(2, (len(palette) - 1).bit_length())
    hdr = b"GIF87a" + struct.pack("<HH", w, h) + bytes([0x80 | (nbits - 1), 0, 0])
    gct = b"".join(bytes(p) for p in palette)
    gct += b"\x00" * ((2 << (nbits - 1)) * 3 - len(gct))
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
    payload = _lzw_encode(indices, min_code) if data is None else data
    blocks = b""
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return hdr + gct + img + bytes([min_code]) + blocks + b"\x00" + b"\x3b"


def test_multimodal_gif_lzw_growth_kwkwk_and_errors():
    """_decode_gif_lzw beyond the oracle query's clear-per-pixel stream:
    a real encoder drives dynamic table growth across width bumps, the
    KwKwK self-reference case, multi-sub-block payloads, and 8-bit root
    codes; corrupt shards fail loudly."""
    import random

    import pytest

    from spark_etl_framework_spark.operators.multimodal import _decode_gif_lzw

    pal8 = [(i * 30 % 256, i * 7 % 256, i * 13 % 256) for i in range(8)]
    # repetitive pattern -> table growth; leading run -> KwKwK
    indices = [5] * 20 + [(i // 3) % 8 for i in range(300)]
    fmt, w, h, c, px8 = _decode_gif_lzw(_gif(16, 20, pal8, indices))
    assert (fmt, w, h, c) == ("gif/lzw", 16, 20, 3)
    assert px8 == b"".join(bytes(pal8[i]) for i in indices)

    # 256-color table, >255-byte LZW payload (multi-sub-block), width
    # bumps through 9..12 bits
    rng = random.Random(7)
    pal256 = [(i, 255 - i, (i * 3) % 256) for i in range(256)]
    big = [rng.randrange(256) for _ in range(4000)] + [9] * 1000
    fmt, w, h, _, px = _decode_gif_lzw(_gif(100, 50, pal256, big, min_code=8))
    assert (w, h) == (100, 50)
    assert px == b"".join(bytes(pal256[i]) for i in big)

    # an extension block before the image descriptor is skipped (89a path)
    # and the decode is byte-identical
    g = _gif(16, 20, pal8, indices)
    ext = b"\x21\xfe\x05hello\x00"  # comment extension
    g2 = b"GIF89a" + g[6 : 13 + 24] + ext + g[13 + 24 :]
    assert _decode_gif_lzw(g2)[4] == px8

    with pytest.raises(NotImplementedError, match="interlaced"):
        _decode_gif_lzw(_gif(16, 20, pal8, indices, interlaced=True))
    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif_lzw(b"BM" + b"\x00" * 60)
    with pytest.raises(ValueError, match="no end-of-information"):
        # chop the EOI off: re-encode then truncate the final sub-block
        data = _lzw_encode([1, 2, 3, 4], 3)[:-1]
        _decode_gif_lzw(_gif(4, 1, pal8, [], data=data))
    with pytest.raises(ValueError, match="expected"):
        _decode_gif_lzw(_gif(5, 1, pal8, [1, 2, 3, 4]))  # 4 pixels for 5x1
    with pytest.raises(ValueError, match="not in table"):
        # code 200 with an 8-entry table: invalid immediately after clear.
        # width is 4 post-clear, so use two bytes: clear(8) then 0xF|... ->
        # craft code 15 (> next_code) right after the clear
        bad = bytes([0x08 | (0xF << 4), 0x09])
        _decode_gif_lzw(_gif(1, 1, pal8, [], data=bad))


def test_multimodal_gif_palette_range_check():
    import pytest

    from spark_etl_framework_spark.operators.multimodal import _decode_gif_lzw

    # 4-entry palette but min_code 3 admits root codes up to 7: index 6
    # decodes fine as LZW yet overruns the palette -> loud failure
    pal4 = [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)]
    with pytest.raises(ValueError, match="palette index out of range"):
        _decode_gif_lzw(_gif(2, 1, pal4, [1, 6]))


def test_multimodal_wav_real_decode(spark):
    """Real RIFF/WAV parse via stdlib wave: sample rate read from the
    header, frames sliced from the decoded PCM stream."""
    import io
    import struct
    import wave

    pcm = bytes(range(64)) * 2  # 128 bytes = 64 16-bit mono samples
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(22050)
        wf.writeframes(pcm)
    df = spark.createDataFrame([(7, bytearray(buf.getvalue()))], "id long, payload binary")
    rows = sorted(
        sample_audio_frames(df, n_frames=4, frame_bytes=32, fake=False).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["sample_rate"] for r in rows] == [22050] * 4
    assert [bytes(r["frame"]) for r in rows] == [pcm[o : o + 32] for o in (0, 32, 64, 96)]


def test_simhash_hamming_pairs_banding_recall(spark):
    """The 4-band pigeonhole join must find every pair within distance 1
    and report exact Hamming distances (identical hashes included)."""
    hashes = spark.createDataFrame(
        [(1, 0b1010101010101010), (2, 0b1010101010101010),  # distance 0
         (3, 0b1010101010101011),                            # distance 1 to 1/2
         (4, 0b0101010101010101)],                           # distance 16 to 1
        ["doc_id", "simhash"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_hamming_pairs(hashes, max_hamming=1).collect()
    }
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_simhash_hamming_pairs_max_bucket_guard(spark):
    """Oversized band buckets are dropped (the quadratic guard), losing
    those candidates only."""
    # 5 identical hashes -> every band bucket holds all 5 docs
    hashes = spark.createDataFrame([(i, 7) for i in range(5)], ["doc_id", "simhash"])
    assert D.simhash_hamming_pairs(hashes, max_bucket=4).count() == 0
    assert D.simhash_hamming_pairs(hashes, max_bucket=5).count() == 10


def test_chunk_token_windows_shapes(spark):
    """Chunks tile the token array with the configured overlap; the tail
    chunk is short but kept."""
    df = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(20)))],
                               ["doc_id", "text"])
    rows = sorted(
        T.chunk_token_windows(df, size=8, stride=6).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0,6,12,18 -> lengths 8,8,8,2
    assert [r["n_tokens"] for r in rows] == [8, 8, 8, 2]
    assert rows[0]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert rows[1]["chunk_text"].split()[0] == "t6"  # overlap of size-stride=2
    assert rows[3]["chunk_text"] == "t18 t19"


def test_stratified_sample_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        ["doc_id", "lang"],
    )
    s1 = {r["doc_id"] for r in T.stratified_sample(df, "lang", {"en": 0.1}, 0.9).collect()}
    s2 = {r["doc_id"] for r in T.stratified_sample(df, "lang", {"en": 0.1}, 0.9).collect()}
    assert s1 == s2  # reproducible, no rand()
    en = sum(1 for d in s1 if d % 2 == 0)
    fr = len(s1) - en
    # 1000 docs per stratum at 10% / 90%: generous tolerance, zero flake risk
    assert 40 <= en <= 180 and 780 <= fr <= 980


def test_connected_components_chain_clique_isolated(spark):
    """Hash-min label propagation: a 4-node chain, a 3-clique, and a
    self-loop isolated node all collapse to their min-id labels."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain
         (10, 11), (10, 12), (11, 12),    # clique
         (20, 20)],                        # isolated self-pair
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["cluster_id"]
           for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_stratified_sample_rate_one_keeps_all(spark):
    """rate >= 1.0 must keep the whole stratum: the threshold int formats to
    5 hex chars ('10000') which compares LESS than any 4-char key, so the
    unclamped filter would keep ~0 rows."""
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(400)],
        ["doc_id", "lang"],
    )
    kept = {r["doc_id"] for r in T.stratified_sample(df, "lang", {"en": 1.0}, 0.0).collect()}
    assert kept == {i for i in range(400) if i % 2 == 0}  # all en, no fr
    # default_rate >= 1.0 keeps everything
    assert T.stratified_sample(df, "lang", {}, 1.5).count() == 400


def test_connected_components_nonconvergence_detected(spark):
    """A path graph's diameter bounds the hash-min round count (the min
    label propagates one hop per round), so max_iter below the diameter
    CANNOT converge — that must raise (default) or warn, never silently
    return stale labels (an 8-node chain, adversarial shape for label
    propagation: a real dup cluster is a clique and converges in 2)."""
    import warnings

    import pytest

    pairs = spark.createDataFrame([(i, i + 1) for i in range(7)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iter=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        partial = D.connected_components(pairs, max_iter=2, on_nonconverged="warn")
    assert any("did not converge" in str(x.message) for x in w)
    assert partial.count() == 8  # partial labels still come back in warn mode
    # and with enough rounds the chain does collapse to label 0
    got = {
        r["node"]: r["cluster_id"]
        for r in D.connected_components(pairs, max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(8)}
    # boundary: diameter == max_iter must SUCCEED (convergence needs one
    # extra observation round, which the operator runs itself)
    got = {
        r["node"]: r["cluster_id"]
        for r in D.connected_components(pairs, max_iter=7).collect()
    }
    assert got == {i: 0 for i in range(8)}


def test_kmv_distinct_exact_small_est_close_large(spark):
    """KMV sketch: groups with < k distinct tokens report the exact count
    (rel_error 0); a 2000-token vocabulary at k=64 estimates within the
    ~2/sqrt(k) (~25%) order-statistics error bound."""
    small = " ".join(f"s{i}" for i in range(20))
    big = " ".join(f"w{i}" for i in range(2000))
    df = spark.createDataFrame(
        [(1, "small", small), (2, "big", big)], ["doc_id", "grp", "text"]
    )
    out = {r["grp"]: r for r in T.kmv_distinct(df, "grp", "text", k=64).collect()}
    assert out["small"]["exact_distinct"] == 20
    assert out["small"]["rel_error"] == 0.0  # below k → exact by definition
    assert out["big"]["exact_distinct"] == 2000
    assert out["big"]["rel_error"] < 0.25


def test_kmeans_cells_separates_blobs(spark):
    """Two well-separated blobs, seeds (ids 0,1) one in each: two Lloyd
    rounds must put every vector with its blob, deterministically."""
    rows = []
    for i in range(10):
        base = 0.0 if i % 2 == 0 else 10.0  # even ids blob A, odd blob B
        rows.append((i, [base + 0.1 * i, base - 0.05 * i, base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cell"] for r in V.kmeans_cells(df, k=2, iters=2).collect()}
    blob_a = {got[i] for i in range(0, 10, 2)}
    blob_b = {got[i] for i in range(1, 10, 2)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    # deterministic across invocations
    again = {r["vec_id"]: r["cell"] for r in V.kmeans_cells(df, k=2, iters=2).collect()}
    assert got == again


def test_kmeans_cells_offset_id_space_and_bad_iters(spark):
    """Seeds are the k LOWEST ids, not ids < k: an id space starting at
    1000 must still produce k seeds and a full assignment; iters < 1 is a
    clear error, not an AttributeError."""
    import pytest

    rows = [(1000 + i, [float(i % 2) * 10 + 0.1 * i, 1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = V.kmeans_cells(df, k=2, iters=2).collect()
    assert len(got) == 8  # every vector assigned (old code returned 0 rows)
    assert {r["cell"] for r in got} == {0, 1}
    with pytest.raises(ValueError, match="iters"):
        V.kmeans_cells(df, k=2, iters=0)


def test_semantic_dedup_keep_first_within_cell(spark):
    """Identical vectors in one cell collapse to the minimum id; a vector
    in another cell survives even if identical to a dropped one."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),   # dup of 1, same cell -> dropped
        (3, [0.0, 1.0], 0),   # orthogonal -> kept
        (4, [1.0, 0.0], 1),   # dup of 1 but other cell -> kept (blocking)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["vec_id"]: r for r in V.semantic_dedup(df, threshold=0.9).collect()}
    assert out[1]["is_kept"] and out[1]["max_cos_prior"] is None
    assert not out[2]["is_kept"] and out[2]["max_cos_prior"] == 1.0
    assert out[3]["is_kept"] and out[3]["max_cos_prior"] == 0.0
    assert out[4]["is_kept"] and out[4]["max_cos_prior"] is None


def test_semantic_dedup_chain_keeps_only_first(spark):
    """A near-dup chain (1~2, 2~3 but 1!~3) drops BOTH 2 and 3: the policy
    is 'has ANY smaller-id neighbor above threshold', not transitive
    closure — documented keep-first semantics."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(1, unit(0.0), 0), (2, unit(0.35), 0), (3, unit(0.7), 0)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    # cos(0.35)~0.94, cos(0.7)~0.76: with threshold 0.9, 1-2 near, 1-3 not,
    # 2-3 near -> 2 dropped (via 1), 3 dropped (via 2)
    out = {r["vec_id"]: r["is_kept"] for r in V.semantic_dedup(df, threshold=0.9).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_incremental_admission_matches_corpus_only(spark):
    """New docs match against the corpus, never against each other: two
    identical NEW docs both admit (no corpus match) while a new doc
    identical to a corpus doc is rejected with jaccard 1.0."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different corpus text about spark plans here")],
        ["doc_id", "text"],
    )
    inc = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
         (20, "novel incoming document with fresh unseen words entirely"),
         (30, "novel incoming document with fresh unseen words entirely")],  # dup of 20 — but 20 is NOT corpus
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.incremental_lsh_matches(corpus, inc).collect()}
    assert out[10]["is_dup"] and out[10]["best_old_id"] == 1 and out[10]["jaccard"] == 1.0
    assert not out[20]["is_dup"] and out[20]["best_old_id"] is None
    assert not out[30]["is_dup"]  # increment never pairs with increment
    assert len(out) == 3  # one row per incoming doc, always


def test_image_channel_stats_known_raster(spark):
    """A hand-built 2x1 P6 image with known RGB bytes must produce exact
    per-channel sums through the real decode + stats chain."""
    from spark_etl_framework_spark.operators.multimodal import (
        decode_images,
        image_channel_stats,
    )

    # pixels: (10, 20, 30) and (40, 60, 80)
    payload = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 60, 80])
    df = spark.createDataFrame([(1, bytearray(payload))], "id bigint, payload binary")
    out = {
        r["channel"]: r
        for r in image_channel_stats(decode_images(df, fake=False)).collect()
    }
    assert out[0]["px_sum"] == 50 and out[0]["px_min"] == 10 and out[0]["px_max"] == 40
    assert out[1]["px_sum"] == 80 and out[2]["px_sum"] == 110
    assert all(out[c]["n_px"] == 2 for c in range(3))


def test_countmin_never_undercounts_and_bounds_overshoot(spark):
    """CM guarantee on a concrete corpus: estimate ≥ true count for every
    token, sketch row count ≤ depth × 16^width, and with 16^3 buckets vs a
    ~300-token stream the expected collision mass is tiny — overshoot 0
    for the heavy token in practice (min over 4 independent rows)."""
    text = " ".join(["heavy"] * 50 + [f"rare{i}" for i in range(250)])
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    sketch = T.countmin_sketch(df, "text", depth=4, width_hex=3)
    rows = sketch.collect()
    assert len(rows) <= 4 * 16**3
    assert sum(r["cnt"] for r in rows) == 4 * 300  # every token hits each row once
    probe = spark.createDataFrame([("heavy", 50), ("rare7", 1)], ["tok", "true_count"])
    est = {r["tok"]: r for r in T.countmin_estimate(probe, sketch, "tok").collect()}
    assert est["heavy"]["est_count"] >= 50
    assert est["rare7"]["est_count"] >= 1
    assert est["heavy"]["est_count"] - 50 <= 8  # 4-row min over ~300/4096 collision mass


def test_bloom_prefilter_join_equals_plain_join(spark):
    """Row-identical to the plain join even with a tiny filter (m=16 →
    heavy false positives, all re-checked by the exact join) and with
    dim keys entirely absent from the fact side (no false negatives)."""
    from spark_etl_framework_spark.operators.joinopt import bloom_prefilter_join

    fact = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [(3, "a"), (7, "b"), (999, "absent")], ["dk", "name"]
    )
    got = (
        bloom_prefilter_join(fact, dim, "k", "dk", m_bits=16, k=2)
        .select("k", "v", "name")
        .collect()
    )
    want = (
        fact.join(dim, fact["k"] == dim["dk"]).select("k", "v", "name").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 40  # 20 rows per present key, absent key matches none


def test_bloom_positions_bounded_by_m(spark):
    from spark_etl_framework_spark.operators.joinopt import bloom_positions

    dim = spark.range(0, 10000).select(F.col("id").alias("k"))
    n = bloom_positions(dim, "k", m_bits=64, k=3).count()
    assert n <= 64  # bounded by m regardless of |dim|


def test_heavy_hitters_mg_exact_and_complete(spark):
    """Adversarial layout: the heavy token is spread evenly across
    partitions (never locally dominant), decoys churn the counters.
    The MG candidate stage must still surface it (guarantee: any token
    above n/(capacity+1) survives), and reported counts are exact."""
    from spark_etl_framework_spark.operators.text import heavy_hitters_mg

    # 40 partitions x 25 docs; each doc: 1 'hot' + 4 unique decoys
    rows = [
        (p * 25 + i, "hot u%d_%d_a u%d_%d_b u%d_%d_c u%d_%d_d" % ((p, i) * 4))
        for p in range(40)
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(40)
    # n = 5000 tokens, hot = 1000 (20%); t=6 -> threshold n/6 ~ 833
    got = heavy_hitters_mg(df, "text", capacity=8, t=6).collect()
    assert [(r["tok"], r["n_occurrences"]) for r in got] == [("hot", 1000)]
    assert abs(got[0]["frequency"] - 0.2) < 1e-9


def test_heavy_hitters_mg_capacity_validation(spark):
    from spark_etl_framework_spark.operators.text import heavy_hitters_mg
    import pytest as _pt

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        heavy_hitters_mg(df, "text", capacity=5, t=10)


def test_bmp_decode_bottom_up_bgr_padding_and_topdown_variant():
    """_decode_bmp must undo all three BMP quirks: bottom-up row order,
    BGR channel order, 4-byte stride padding — and honor the negative-
    height top-down variant. 1x2 image: top pixel RGB=(1,2,3), bottom
    RGB=(4,5,6); stride = 4 bytes (3 + 1 pad)."""
    import struct

    from spark_etl_framework_spark.operators.multimodal import _decode_bmp

    def hdr(height):
        img = 4 * 2
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + img, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 1, height, 1, 24, 0, img, 0, 0, 0, 0)
        )

    # bottom-up: stored row 0 is the BOTTOM pixel, stored as BGR
    raster_bu = bytes([6, 5, 4, 0]) + bytes([3, 2, 1, 0])
    fmt, w, h, c, px = _decode_bmp(hdr(2) + raster_bu)
    assert (fmt, w, h, c) == ("bmp/rgb8", 1, 2, 3)
    assert px == bytes([1, 2, 3, 4, 5, 6])

    # top-down (negative height): stored row 0 is the TOP pixel
    raster_td = bytes([3, 2, 1, 0]) + bytes([6, 5, 4, 0])
    assert _decode_bmp(hdr(-2) + raster_td)[4] == bytes([1, 2, 3, 4, 5, 6])

    import pytest as _pt

    with _pt.raises(NotImplementedError):  # 8-bit palette BMP stays gated
        _decode_bmp(
            b"BM"
            + struct.pack("<IHHI", 54 + 8, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 8, 0, 8, 0, 0, 0, 0)
            + b"\0" * 8
        )
    with _pt.raises(ValueError):  # truncated raster detected
        _decode_bmp(hdr(2) + raster_bu[:5])

    # crafted w <= 0 / h == 0 headers: clear ValueError, not an opaque
    # numpy frombuffer/reshape error (round-4 ADVICE)
    def dims_hdr(width, height):
        return (
            b"BM"
            + struct.pack("<IHHI", 54, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
        )

    with _pt.raises(ValueError, match="malformed BMP dimensions"):
        _decode_bmp(dims_hdr(0, 2))
    with _pt.raises(ValueError, match="malformed BMP dimensions"):
        _decode_bmp(dims_hdr(-3, 2))
    with _pt.raises(ValueError, match="malformed BMP dimensions"):
        _decode_bmp(dims_hdr(1, 0))


def test_pagerank_path_graph_invariants(spark):
    """Undirected path a-b-c: total mass conserved (no dangling nodes
    after symmetrize), endpoints symmetric, center ranks highest."""
    from spark_etl_framework_spark.operators.graph import pagerank, symmetrize

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["s", "d"])
    r = {
        row["node"]: row["rank"]
        for row in pagerank(symmetrize(edges, "s", "d"), iters=10).collect()
    }
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert abs(r["a"] - r["c"]) < 1e-12
    assert r["b"] > r["a"]


def test_mulaw_decode_known_vectors_and_chunk_order(spark):
    """G.711 endpoints: 0x00 -> -32124, 0x7F/0xFF -> 0, 0x80 -> +32124.
    The RIFF walk must also accept data BEFORE fmt (chunk order is not
    fixed by the spec) and reject PCM payloads toward the PCM path."""
    import struct

    from spark_etl_framework_spark.operators.multimodal import decode_audio_mulaw

    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = bytes([0x00, 0x7F, 0xFF, 0x80])

    def riff(chunks):
        body = b"".join(
            cid + struct.pack("<I", len(c)) + c + (b"\0" if len(c) & 1 else b"")
            for cid, c in chunks
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    wavs = [
        (1, riff([(b"fmt ", fmt), (b"data", data)])),
        (2, riff([(b"data", data), (b"fmt ", fmt)])),  # reversed order
    ]
    df = spark.createDataFrame(wavs, ["id", "payload"])
    rows = {r["id"]: r for r in decode_audio_mulaw(df).collect()}
    for rid in (1, 2):
        assert rows[rid]["sample_rate"] == 8000
        assert rows[rid]["pcm"] == [-32124, 0, 0, 32124]

    import pytest as _pt

    pcm_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    bad = spark.createDataFrame(
        [(3, riff([(b"fmt ", pcm_fmt), (b"data", data)]))], ["id", "payload"]
    )
    with _pt.raises(Exception, match="format 1|mu-law"):
        decode_audio_mulaw(bad).collect()


def test_power_iteration_recovers_planted_direction(spark):
    """Vectors lie (almost) on a planted axis -> PC1 must align with it:
    |component| ~ 1 on that dim, ~0 elsewhere, unit norm."""
    import math

    rows = [(i, [0.001 * i, 2.0 + 0.01 * i, 0.002 * i, 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    comp = {
        r["dim"]: r["component"]
        for r in V.power_iteration_pc1(df, "embedding", dim=4, iters=5).collect()
    }
    assert abs(abs(comp[1]) - 1.0) < 1e-3
    assert abs(math.sqrt(sum(c * c for c in comp.values())) - 1.0) < 1e-9
    with __import__("pytest").raises(ValueError):
        V.power_iteration_pc1(df, "embedding", dim=4, iters=0)


def test_jl_project_orthogonal_recovery_and_shape(spark):
    """Projecting the projection matrix's own first row must recover
    sqrt(k)-scaled coordinates exactly: dot(row_j, row_0)/sqrt(k) is
    +/-in_dim/sqrt(k) when j == 0-aligned and bounded otherwise; also
    checks output arity."""
    from spark_etl_framework_spark.operators.vector import (
        jl_project,
        jl_projection_matrix,
    )

    m = jl_projection_matrix(8, 4, seed=7)
    df = spark.createDataFrame([(0, m[0])], ["vec_id", "embedding"])
    row = jl_project(df, "embedding", in_dim=8, out_dim=4, seed=7).first()
    red = row["reduced"]
    assert len(red) == 4
    assert abs(red[0] - 8 / 2.0) < 1e-9  # dot(row0,row0)/sqrt(4) = 8/2
    for v in red[1:]:
        assert abs(v) <= 8 / 2.0 + 1e-9


def test_heavy_hitters_mg_null_and_empty_text(spark):
    """NULL/empty texts must contribute nothing to the token mass (the
    pre-fix total subtracted 1 per NULL doc via legacy size(NULL) = -1):
    3 'hot' among 6 real tokens -> frequency 0.5 exactly."""
    from spark_etl_framework_spark.operators.text import heavy_hitters_mg

    df = spark.createDataFrame(
        [(1, "hot hot hot"), (2, None), (3, ""), (4, "x y z")],
        ["doc_id", "text"],
    )
    got = heavy_hitters_mg(df, "text", capacity=8, t=3).collect()
    assert [(r["tok"], r["n_occurrences"], r["frequency"]) for r in got] == [
        ("hot", 3, 0.5)
    ]


def test_tar_index_skips_dirs_validates_checksum_and_truncation(spark):
    """index_tar_members: directory members are skipped, a corrupted
    header checksum raises, and a member whose declared size overruns
    the archive raises."""
    import io
    import struct
    import tarfile

    from spark_etl_framework_spark.operators.multimodal import index_tar_members

    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    d = tarfile.TarInfo("subdir/")
    d.type = tarfile.DIRTYPE
    tf.addfile(d)
    ti = tarfile.TarInfo("subdir/a.bin")
    data = b"hello tar"
    ti.size = len(data)
    tf.addfile(ti, io.BytesIO(data))
    tf.close()
    raw = buf.getvalue()

    rows = index_tar_members(
        spark.createDataFrame([(1, raw)], ["id", "payload"])
    ).collect()
    assert [(r["member_name"], r["size"], bytes(r["content"])) for r in rows] == [
        ("subdir/a.bin", 9, b"hello tar")
    ]
    assert rows[0]["data_offset"] == 1024  # dir header block, then file header

    import pytest as _pt

    corrupt = bytearray(raw)
    corrupt[0] ^= 0xFF  # name byte flips -> checksum mismatch
    with _pt.raises(Exception, match="checksum"):
        index_tar_members(
            spark.createDataFrame([(2, bytes(corrupt))], ["id", "payload"])
        ).collect()

    with _pt.raises(Exception, match="truncated tar"):
        index_tar_members(
            spark.createDataFrame([(3, raw[:1030])], ["id", "payload"])
        ).collect()


def test_pq_codes_equal_per_slice_kmeans(spark, sf_dir):
    """The grouped single-plan PQ trainer must assign exactly the codes
    the per-slice kmeans_cells quantizer assigns (same seeds, rounding,
    tiebreaks) — subspace grouping is a plan optimization, not a
    semantics change."""
    from spark_etl_framework_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(60)
    got = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in V.pq_codes(emb, "vec_id", "embedding", m=4, sub=16, k=3, iters=2).collect()
    }
    for s in range(4):
        sliced = emb.select(
            "vec_id",
            F.slice(F.col("embedding").cast("array<double>"), s * 16 + 1, 16).alias("sub"),
        )
        want = {
            r["vec_id"]: r["cell"]
            for r in V.kmeans_cells(sliced, "vec_id", "sub", k=3, iters=2).collect()
        }
        for vid, cell in want.items():
            assert got[(vid, s)] == cell, (vid, s)


def test_image_ahash_known_bits(spark):
    """2x2 gray raster [10, 20, 30, 200]: mean 65 -> bits 0001; and the
    all-equal raster hashes to all zeros (strict >)."""
    from spark_etl_framework_spark.operators.multimodal import image_ahash

    df = spark.createDataFrame(
        [(1, bytes([10, 20, 30, 200])), (2, bytes([7, 7, 7, 7]))],
        ["id", "pixels"],
    )
    got = {r["id"]: (r["ahash_bits"], r["mean_px"]) for r in image_ahash(df).collect()}
    assert got[1] == ("0001", 65.0)
    assert got[2] == ("0000", 7.0)


def test_tar_index_ustar_prefix_and_block_boundary_truncation(spark):
    """Long paths (>100 chars) must rejoin the USTAR prefix field, and an
    archive cut at a BLOCK boundary (no zero terminator) must raise."""
    import io
    import tarfile

    from spark_etl_framework_spark.operators.multimodal import index_tar_members

    long_name = "train/shard_000/" + "d" * 80 + "/sample_000123.bin"
    assert len(long_name) > 100
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    ti = tarfile.TarInfo(long_name)
    ti.size = 4
    tf.addfile(ti, io.BytesIO(b"abcd"))
    tf.close()
    raw = buf.getvalue()
    rows = index_tar_members(
        spark.createDataFrame([(1, raw)], ["id", "payload"])
    ).collect()
    assert rows[0]["member_name"] == long_name

    import pytest as _pt

    cut = raw[:1024]  # header block + data block, terminator stripped
    with _pt.raises(Exception, match="zero block"):
        index_tar_members(
            spark.createDataFrame([(2, cut)], ["id", "payload"])
        ).collect()


def test_interval_coverage_tied_timestamps(spark, tmp_path):
    """Two events at the IDENTICAL timestamp must land in one island with
    span exactly 5 minutes — the island-numbering tiebreak (s, event_id)
    keeps tied starts attached to the right island."""
    import datetime as dt

    from spark_etl_framework_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "view", 1.0, "{}"),
        (2, base, 7, "click", 1.0, "{}"),  # tied start
        (3, base + dt.timedelta(minutes=30), 7, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf_tiny")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = {r["user_id"]: r for r in QUERIES["ts_interval_coverage"](spark, d).collect()}
    assert out[7]["n_islands"] == 2
    assert out[7]["covered_ms"] == 2 * 5 * 60 * 1000


def test_bpe_train_merges_classic_example(spark):
    """The textbook corpus 'low low lower': merges must be (l,o)x3 —
    tiebreak over (o,w) — then (lo,w)x3, then (e,r)x1 — tiebreak over
    (low,e)."""
    from spark_etl_framework_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(1, "low low lower")], ["doc_id", "text"])
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, "text", rounds=3)
        .orderBy("round")
        .collect()
    ]
    assert got == [(1, "l", "o", 3), (2, "lo", "w", 3), (3, "e", "r", 1)]

    import pytest as _pt

    with _pt.raises(ValueError):
        bpe_train_merges(df, "text", rounds=0)


def test_kaplan_meier_censoring_textbook(spark, tmp_path):
    """Constructed cohort: at t=1h two of four at-risk users churn
    (S=0.5), at t=2h one of the remaining... censored users reduce the
    risk set without counting as events. Verifies against the hand
    KM product."""
    import datetime as dt

    from spark_etl_framework_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1)
    end = dt.datetime(2024, 1, 20)

    def span(uid, hours, churned):
        last = base + dt.timedelta(hours=hours)
        if not churned:
            last = end  # active at the very edge -> censored
        return [(uid * 10, base, uid, "view", 1.0, "{}"),
                (uid * 10 + 1, last, uid, "view", 1.0, "{}")]

    rows = (
        span(1, 1, True) + span(2, 1, True) + span(3, 2, True) + span(4, 5, False)
    )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = str(tmp_path / "km")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = {r["duration_hours"]: r for r in QUERIES["events_kaplan_meier"](spark, d).collect()}
    # t=1: n=4, d=2 -> S=0.5 ; t=2: n=2, d=1 -> S=0.25 ; censored user at 456h
    assert out[1]["n_at_risk"] == 4 and out[1]["n_events"] == 2
    assert abs(out[1]["survival"] - 0.5) < 1e-6
    assert out[2]["n_at_risk"] == 2 and out[2]["n_events"] == 1
    assert abs(out[2]["survival"] - 0.25) < 1e-6
    cens = max(out)
    assert out[cens]["n_events"] == 0 and out[cens]["n_censored"] == 1
    assert abs(out[cens]["survival"] - 0.25) < 1e-6


def test_pack_tar_members_stdlib_readable_and_roundtrips(spark):
    """Archives from pack_tar_members must parse with the stdlib tarfile
    module (an independent implementation) AND round-trip through our
    own indexer, including a >100-char prefixed path."""
    import io
    import tarfile

    from spark_etl_framework_spark.operators.multimodal import (
        index_tar_members,
        pack_tar_members,
    )

    long_name = "train/" + "p" * 70 + "/x" * 20 + "/sample.bin"
    rows = [
        (1, "a.txt", b"hello"),
        (1, long_name, b"world!!"),
        (2, "b.bin", b"\x00\x01\x02"),
    ]
    df = spark.createDataFrame(rows, ["id", "member_name", "content"])
    packed = {r["id"]: bytes(r["payload"]) for r in pack_tar_members(df).collect()}

    with tarfile.open(fileobj=io.BytesIO(packed[1])) as tf:
        got = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    assert got == {"a.txt": b"hello", long_name: b"world!!"}

    idx = index_tar_members(
        spark.createDataFrame(
            [(k, v) for k, v in packed.items()], ["id", "payload"]
        )
    ).collect()
    back = {(r["id"], r["member_name"]): bytes(r["content"]) for r in idx}
    assert back[(1, "a.txt")] == b"hello"
    assert back[(1, long_name)] == b"world!!"
    assert back[(2, "b.bin")] == b"\x00\x01\x02"


def test_bpe_pipe_tokens_and_exhausted_rounds(spark):
    """Tokens containing '|' must decompose as real characters (escaped
    fencing), and rounds beyond the corpus's possible merges must leave
    the vocabulary intact and simply emit fewer merge rows."""
    from spark_etl_framework_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(1, "a|b a|b x")], ["doc_id", "text"])
    merges, vocab = bpe_train_merges(df, "text", rounds=5, with_vocab=True)
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in merges.orderBy("round").collect()
    ]
    # 'a|b' x2: pairs (a,|) and (|,b) tie at 2; the tiebreak compares
    # ESCAPED symbols (\x1a < 'a'), so (|,b) merges first, then (a,|b) —
    # deterministic and engine-consistent. After that nothing mergeable.
    assert got == [(1, "|", "b", 2), (2, "a", "|b", 2)]
    v = {r["w"]: r["n_symbols"] for r in vocab.collect()}
    assert v == {"a|b": 1, "x": 1}  # vocabulary survives the empty rounds


def test_video_frame_splitting_and_sampling(spark):
    """_split_netpbm_frames: variable-size frames split on real header
    arithmetic; sample_video_frames strides correctly and rejects corrupt
    containers and bad stride parameters."""
    import pytest as _pt

    from spark_etl_framework_spark.operators.multimodal import (
        _split_netpbm_frames,
        sample_video_frames,
    )

    f1 = b"P6\n2 1\n255\n" + bytes(6)        # 2x1 RGB
    f2 = b"P5\n3 2\n255\n" + bytes(6)        # 3x2 gray — different size
    f3 = b"P6\n1 1\n255\n" + bytes([9, 8, 7])
    frames = _split_netpbm_frames(f1 + f2 + f3)
    assert [fr[:2] for fr in frames] == [b"P6", b"P5", b"P6"]
    assert frames[2][-3:] == bytes([9, 8, 7])

    with _pt.raises(ValueError, match="no netpbm magic"):
        _split_netpbm_frames(f1 + b"XX junk")
    with _pt.raises(ValueError, match="truncated"):
        _split_netpbm_frames(f1[:-2])

    df = spark.createDataFrame([(1, bytearray(f1 + f2 + f3))], "id bigint, payload binary")
    out = sample_video_frames(df, every_n=2, offset=0).collect()
    assert [(r.frame_idx, r.n_frames, r.width, r.height, r.channels) for r in out] == [
        (0, 3, 2, 1, 3),
        (2, 3, 1, 1, 3),
    ]
    with _pt.raises(ValueError):
        sample_video_frames(df, every_n=0)
    with _pt.raises(ValueError):
        sample_video_frames(df, offset=-1)


# ---------------------------------------------------------------------------
# PNG: real DEFLATE + all five scanline filters (operators/multimodal.py)
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_encode(pixels, color_type: int, filters, palette=None) -> bytes:
    """Reference encoder for the roundtrip tests: applies the REQUESTED
    filter type per scanline exactly as the spec's filtering algorithm,
    then real zlib DEFLATE."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * c).astype(np.int32)
    bpp = c
    lines = bytearray()
    for y, ftype in zip(range(h), filters):
        cur = flat[y]
        above = flat[y - 1] if y > 0 else np.zeros_like(cur)
        raw = np.zeros_like(cur)
        for x in range(w * c):
            left = cur[x - bpp] if x >= bpp else 0
            up = above[x]
            ul = above[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc_ else up if pb <= pc_ else ul
            raw[x] = (cur[x] - pred) & 0xFF
        lines += bytes([ftype]) + raw.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", bytes(palette))
    out += _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
    return out + _png_chunk(b"IEND", b"")


def test_multimodal_png_all_filters_all_color_types():
    import numpy as np

    from spark_etl_framework_spark.operators.multimodal import _decode_png

    rng = (np.arange(20 * 24 * 4, dtype=np.int64) * 157 + 13) % 251
    # gray: 24 rows cycle through every filter type
    gray = rng[: 20 * 24].astype(np.uint8).reshape(24, 20)
    fmt, w, h, c, px = _decode_png(
        _png_encode(gray, 0, [y % 5 for y in range(24)])
    )
    assert (fmt, w, h, c) == ("png/gray", 20, 24, 1)
    assert px == gray.tobytes()
    # rgb + rgba: Paeth everywhere (the hardest inverse)
    rgb = rng[: 20 * 24 * 3].astype(np.uint8).reshape(24, 20, 3)
    fmt, w, h, c, px = _decode_png(_png_encode(rgb, 2, [4] * 24))
    assert (fmt, c) == ("png/rgb", 3) and px == rgb.tobytes()
    rgba = rng.astype(np.uint8).reshape(24, 20, 4)
    fmt, w, h, c, px = _decode_png(_png_encode(rgba, 6, [3] * 24))
    assert (fmt, c) == ("png/rgba", 4) and px == rgba.tobytes()
    # palette: indices expand through PLTE to rgb
    pal = bytes(range(48))  # 16 rgb entries
    idx = (rng[: 8 * 6] % 16).astype(np.uint8).reshape(6, 8)
    fmt, w, h, c, px = _decode_png(
        _png_encode(idx, 3, [1] * 6, palette=pal)
    )
    assert (fmt, w, h, c) == ("png/palette", 8, 6, 3)
    exp = np.frombuffer(pal, np.uint8).reshape(16, 3)[idx.reshape(-1)]
    assert px == exp.tobytes()


def test_multimodal_png_hand_checked_sub_filter():
    """2x2 gray, filter Sub on both rows: recon[x] = raw[x] + recon[x-1]
    mod 256 — the expected bytes are computed by hand, so the decoder
    can't be self-consistently wrong with the test encoder."""
    import struct
    import zlib

    from spark_etl_framework_spark.operators.multimodal import _decode_png

    # filtered scanlines: [1, 200, 100] and [1, 7, 250] (type byte first)
    lines = bytes([1, 200, 100, 1, 7, 250])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    _f, _w, _h, _c, px = _decode_png(raw)
    # row0: 200, (100+200)%256=44 ; row1: 7, (250+7)%256=1
    assert list(px) == [200, 44, 7, 1]


def test_multimodal_png_failures_are_loud():
    import numpy as np
    import pytest

    from spark_etl_framework_spark.operators.multimodal import _decode_png

    gray = np.zeros((4, 4), dtype=np.uint8)
    good = _png_encode(gray, 0, [0, 1, 2, 4])
    bad = bytearray(good)
    bad[40] ^= 0x01  # flip a bit inside a chunk body
    with pytest.raises(ValueError, match="CRC mismatch"):
        _decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        _decode_png(b"\x89PNJ" + good[4:])
    # 16-bit depth and interlace must be refused by name, not mis-decoded
    import struct
    import zlib as _z

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    p16 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        _decode_png(p16)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    pi = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_i)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlacing"):
        _decode_png(pi)
    # corrupt DEFLATE stream -> zlib error surfaces, not silent garbage
    idat_broken = _png_chunk(b"IDAT", b"\x00bogus")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    pz = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + idat_broken
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(_z.error):
        _decode_png(pz)


# ---------------------------------------------------------------------------
# JPEG: baseline huffman + IDCT (operators/multimodal.py)
# ---------------------------------------------------------------------------

#: standard huffman tables from the JPEG spec annex K (public)
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_codes(counts, symbols):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _jpeg_encode(arr, quant, subsample=(1, 1), restart=0):
    """Reference baseline encoder: FDCT -> quantize -> zigzag ->
    annex-K huffman; gray (2-D input) or RGB (3-D, BT.601 forward,
    chroma subsampled by ``subsample``)."""
    import struct

    import numpy as np

    from spark_etl_framework_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _idct_matrix,
    )

    A = _idct_matrix()
    dc = _jpeg_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac = _jpeg_codes(_AC_COUNTS, _AC_SYMBOLS)
    q = np.asarray(quant, dtype=np.int32)

    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    if gray:
        planes = [arr]
        samps = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        sh, sv = subsample

        def down(p):
            if sh == 1 and sv == 1:
                return p
            ph = -(-p.shape[0] // sv) * sv
            pw = -(-p.shape[1] // sh) * sh
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                         mode="edge")
            return pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

        planes = [y, down(cb), down(cr)]
        samps = [(sh, sv), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for p, (sh_, sv_) in zip(planes, samps):
        ph, pw = mcuy * sv_ * 8, mcux * sh_ * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        )

    bw = _JpegBitWriter()
    segments = [bw]  # entropy segments split by restarts

    def encode_block(plane, y0, x0, pred):
        f = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        F = A @ f @ A.T
        coeffs = np.round(F.reshape(64)[np.argsort(_JPEG_ZIGZAG)])
        zz = np.zeros(64, dtype=np.int64)
        for i, z in enumerate(_JPEG_ZIGZAG):
            zz[i] = int(round(F.reshape(64)[z] / q[i]))
        diff = int(zz[0]) - pred
        t = int(diff != 0 and int(abs(diff)).bit_length())
        lw = segments[-1]
        ln, cd = dc[t]
        lw.put(cd, ln)
        if t:
            lw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        run = 0
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                ln, cd = ac[0xF0]
                lw.put(cd, ln)
                run -= 16
            v = int(zz[i])
            s = int(abs(v)).bit_length()
            ln, cd = ac[(run << 4) | s]
            lw.put(cd, ln)
            lw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, cd = ac[0x00]
            lw.put(cd, ln)
        return int(zz[0])

    preds = [0] * len(planes)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                segments[-1].flush()
                segments.append(_JpegBitWriter())
                preds = [0] * len(planes)  # spec: RST resets DC predictors
            mcu_i += 1
            for ci, (plane, (sh_, sv_)) in enumerate(zip(padded, samps)):
                for by in range(sv_):
                    for bx in range(sh_):
                        preds[ci] = encode_block(
                            plane, (my * sv_ + by) * 8, (mx * sh_ + bx) * 8,
                            preds[ci],
                        )
    segments[-1].flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_q = bytes(int(x) for x in q)
    out = b"\xff\xd8" + seg(0xDB, b"\x00" + zz_q)
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sh_, sv_ = samps[ci]
        sof += bytes([ci + 1, (sh_ << 4) | sv_, 0])
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS)
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS),
    )
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    for i, s in enumerate(segments):
        out += bytes(s.out)
        if i < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    return out + b"\xff\xd9"


def test_multimodal_jpeg_dc_only_exact():
    """Constant 8x8 blocks with even values and Q=16: DC quantization is
    exact by construction, so the baseline decode must reproduce the
    input byte-for-byte — a hand-checkable anchor (DC = 8*(v-128),
    quantized by 16 → (v-128)/2 integral for even v)."""
    import numpy as np

    from spark_etl_framework_spark.operators.multimodal import _decode_jpeg

    vals = [2, 64, 130, 254, 16, 200, 88, 100]
    img = np.zeros((16, 32), dtype=np.uint8)
    for i, v in enumerate(vals):
        by, bx = divmod(i, 4)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    raw = _jpeg_encode(img, [16] * 64)
    fmt, w, h, c, px = _decode_jpeg(raw)
    assert (fmt, w, h, c) == ("jpeg/gray", 32, 16, 1)
    assert px == img.tobytes()


def test_multimodal_jpeg_gray_roundtrip_error_bound():
    import numpy as np

    from spark_etl_framework_spark.operators.multimodal import _decode_jpeg

    rng = ((np.arange(24 * 17, dtype=np.int64) * 97 + 31) % 256).astype(np.uint8)
    img = rng.reshape(17, 24)  # non-multiple-of-8: exercises crop
    raw = _jpeg_encode(img, [1] * 64)  # Q=1: only FDCT rounding loss
    fmt, w, h, c, px = _decode_jpeg(raw)
    assert (w, h) == (24, 17)
    got = np.frombuffer(px, np.uint8).reshape(17, 24).astype(np.int32)
    assert int(np.abs(got - img.astype(np.int32)).max()) <= 2


def test_multimodal_jpeg_color_420_and_restart():
    import numpy as np

    from spark_etl_framework_spark.operators.multimodal import _decode_jpeg

    # constant-chroma image: 4:2:0 subsampling is exact for chroma;
    # 16x64 = four 16x16 MCUs, so restart=2 emits a mid-scan RST
    r = ((np.arange(64 * 16, dtype=np.int64) * 53) % 200 + 20).astype(np.float64)
    y = r.reshape(16, 64)
    img = np.stack([y, y, y], axis=-1)  # gray-ish RGB → Cb=Cr=128
    raw = _jpeg_encode(img, [1] * 64, subsample=(2, 2), restart=2)
    assert b"\xff\xd0" in raw  # RST0 marker present mid-scan
    fmt, w, h, c, px = _decode_jpeg(raw)
    assert (fmt, w, h, c) == ("jpeg/rgb", 64, 16, 3)
    got = np.frombuffer(px, np.uint8).reshape(16, 64, 3).astype(np.int32)
    assert int(np.abs(got - img.astype(np.int32)).max()) <= 3


def test_multimodal_jpeg_failures_are_loud():
    import numpy as np
    import pytest

    from spark_etl_framework_spark.operators.multimodal import _decode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8)
    good = _jpeg_encode(img, [16] * 64)
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        _decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"nope" + good)


def _avi(frames, extra_chunks=()):
    """Minimal MJPEG AVI: RIFF/AVI with a movi LIST of 00dc chunks
    (word-aligned), plus optional foreign chunks the splitter must skip."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    movi = b"movi"
    for f in frames:
        movi += chunk(b"00dc", f)
    for cid, body in extra_chunks:
        movi += chunk(cid, body)
    body = b"AVI " + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_multimodal_avi_mjpeg_frame_sampling(spark):
    """MJPEG-in-AVI: the RIFF walk yields the 00dc JPEG frames in order
    (skipping audio/index chunks), the stride keeps every 2nd, and the
    DC-only frames decode EXACTLY to their constant values."""
    import numpy as np

    from spark_etl_framework_spark.operators.multimodal import (
        _split_avi_mjpeg_frames,
        sample_video_frames,
    )

    vals = [40, 90, 140, 190]
    frames = [
        _jpeg_encode(np.full((8, 8), v, dtype=np.uint8), [16] * 64)
        for v in vals
    ]
    avi = _avi(frames, extra_chunks=[(b"01wb", b"audio!"), (b"idx1", b"\x00" * 16)])
    assert [f[:2] for f in _split_avi_mjpeg_frames(avi)] == [b"\xff\xd8"] * 4

    df = spark.createDataFrame([(1, bytearray(avi))], "id long, payload binary")
    out = sample_video_frames(df, every_n=2).collect()
    assert [(r.frame_idx, r.n_frames, r.width, r.height) for r in out] == [
        (0, 4, 8, 8), (2, 4, 8, 8)]
    assert [bytes(r.pixels) for r in out] == [
        bytes([vals[0]]) * 64, bytes([vals[2]]) * 64]


def test_multimodal_avi_corrupt_fails_loudly():
    import struct

    import numpy as np
    import pytest

    from spark_etl_framework_spark.operators.multimodal import (
        _split_avi_mjpeg_frames,
    )

    f = _jpeg_encode(np.zeros((8, 8), dtype=np.uint8), [16] * 64)
    good = _avi([f])
    with pytest.raises(ValueError, match="RIFF"):
        _split_avi_mjpeg_frames(b"JUNK" + good[4:])
    # a dc chunk whose payload is not JPEG
    bad = _avi([b"not-a-jpeg!!"])
    with pytest.raises(ValueError, match="not JPEG"):
        _split_avi_mjpeg_frames(bad)
    # declared size overrunning the file
    trunc = bytearray(good)
    trunc[-10:] = b""  # chop the tail off the last chunk
    trunc[4:8] = struct.pack("<I", len(trunc) - 8)
    with pytest.raises(ValueError, match="overruns"):
        _split_avi_mjpeg_frames(bytes(trunc))


# ---------------------------------------------------------------------------
# FLAC: Rice + fixed/LPC prediction (operators/multimodal.py)
# ---------------------------------------------------------------------------


class _FlacBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_signed(self, value, nbits):
        self.put(value & ((1 << nbits) - 1), nbits)

    def put_unary(self, q):
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self):
        while self.n:
            self.put(0, 1)


def _flac_encode(channels, sample_rate=8000, bps=16, fixed_order=1,
                 rice_param=10, subframe="fixed"):
    """Reference encoder: one frame, FIXED predictor (or constant /
    verbatim subframes), single Rice partition. FLAC is lossless so the
    decoder must reproduce the samples exactly."""
    from spark_etl_framework_spark.operators.multimodal import _crc8, _crc16

    n = len(channels[0])
    nch = len(channels)
    w = _FlacBitWriter()
    # STREAMINFO
    si = _FlacBitWriter()
    si.put(n, 16)
    si.put(n, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    si_body = bytes(si.out) + b"\x00" * 16  # md5 unset
    head = b"fLaC" + bytes([0x80]) + len(si_body).to_bytes(3, "big") + si_body

    f = _FlacBitWriter()
    f.put(0x3FFE, 14)
    f.put(0, 1)
    f.put(0, 1)  # fixed blocksize stream
    f.put(7, 4)  # block size: 16-bit at end of header
    f.put(0, 4)  # sample rate: from STREAMINFO
    f.put(nch - 1, 4)  # independent channels
    f.put(0, 3)  # sample size: from STREAMINFO
    f.put(0, 1)
    f.put(0, 8)  # frame number 0 (utf8)
    f.put(n - 1, 16)  # block size field
    f.align()
    hdr = bytes(f.out)
    f.put(_crc8(hdr), 8)

    for ch in channels:
        f.put(0, 1)  # padding
        if subframe == "constant":
            f.put(0, 6)
            f.put(0, 1)
            f.put_signed(ch[0], bps)
            continue
        if subframe == "verbatim":
            f.put(1, 6)
            f.put(0, 1)
            for v in ch:
                f.put_signed(v, bps)
            continue
        f.put(8 + fixed_order, 6)  # FIXED
        f.put(0, 1)  # no wasted bits
        for v in ch[:fixed_order]:
            f.put_signed(v, bps)
        coefs = {0: [], 1: [1], 2: [2, -1]}[fixed_order]
        f.put(0, 2)  # rice method 0
        f.put(0, 4)  # partition order 0
        f.put(rice_param, 4)
        for i in range(fixed_order, n):
            pred = sum(c * ch[i - 1 - j] for j, c in enumerate(coefs))
            e = ch[i] - pred
            u = (e << 1) if e >= 0 else ((-e) << 1) - 1
            f.put_unary(u >> rice_param)
            f.put(u & ((1 << rice_param) - 1), rice_param)
    f.align()
    body = bytes(f.out)
    f.put(_crc16(body), 16)
    return head + bytes(f.out)


def test_flac_fixed_orders_and_subframe_types_lossless():
    from spark_etl_framework_spark.operators.multimodal import _decode_flac

    samples = [((i * 251 + 17) % 4001) - 2000 for i in range(64)]
    for order in (0, 1, 2):
        raw = _flac_encode([samples], fixed_order=order)
        rate, nch, bps, chans = _decode_flac(raw)
        assert (rate, nch, bps) == (8000, 1, 16)
        assert chans[0] == samples, f"order {order} mismatch"
    for kind in ("constant", "verbatim"):
        src = [137] * 64 if kind == "constant" else samples
        rate, _n, _b, chans = _decode_flac(_flac_encode([src], subframe=kind))
        assert chans[0] == src
    # stereo independent
    right = [-v for v in samples]
    _r, nch, _b, chans = _decode_flac(_flac_encode([samples, right]))
    assert nch == 2 and chans[0] == samples and chans[1] == right


def test_flac_crc_guards_and_magic():
    import pytest

    from spark_etl_framework_spark.operators.multimodal import _decode_flac

    samples = [i * 3 - 50 for i in range(32)]
    good = _flac_encode([samples])
    with pytest.raises(ValueError, match="fLaC magic"):
        _decode_flac(b"OggS" + good[4:])
    bad = bytearray(good)
    bad[-3] ^= 0x01  # corrupt inside the last subframe byte region
    with pytest.raises(ValueError, match="CRC-16|CRC-8|sync"):
        _decode_flac(bytes(bad))


def test_flac_audio_frame_sampling(spark):
    """sample_audio_frames over a FLAC payload: decode to PCM16 then
    slice — rate from STREAMINFO, samples exact (lossless)."""
    import struct

    from spark_etl_framework_spark.operators.multimodal import (
        sample_audio_frames,
    )

    samples = [((i * 97) % 2001) - 1000 for i in range(256)]
    raw = _flac_encode([samples], sample_rate=16000)
    df = spark.createDataFrame([(1, bytearray(raw))], "id long, payload binary")
    out = sample_audio_frames(df, n_frames=2, frame_bytes=64).collect()
    assert [r.sample_rate for r in out] == [16000, 16000]
    first = struct.unpack("<32h", bytes(out[0].frame))
    assert list(first) == samples[:32]
