"""Third coverage wave: semi-structured JSON, string aggregation, null-safe
equality, correlated scalar subqueries, math/conditional functions, histogram
bucketing, registered-UDF usage, and the mapInPandas stub (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "json_extract_props",
    oracle="""
    WITH ev AS (SELECT event_type, CAST(props->>'k' AS INT) AS k FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT)       AS n,
           CAST(sum(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(k) AS INT)            AS min_k,
           CAST(max(k) AS INT)            AS max_k
    FROM ev GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: extract a field from the JSON props column
    (get_json_object — no schema declaration needed) and aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations_csv
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (sorted before joining — collect order is
    partition-dependent, the sort makes it deterministic)."""
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations_csv")
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (SELECT r_regionkey, nullif(r_regionkey % 2, 0) AS parity FROM region),
         b AS (SELECT r_regionkey, nullif(r_regionkey % 2, 0) AS parity FROM region)
    SELECT a.r_regionkey AS key_a, b.r_regionkey AS key_b
    FROM a JOIN b ON a.parity IS NOT DISTINCT FROM b.parity
                 AND a.r_regionkey < b.r_regionkey
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing."""
    re_ = load_table(spark, sf_dir, "region")
    parity = F.nullif(F.col("r_regionkey") % 2, F.lit(0))
    a = re_.select(F.col("r_regionkey").alias("key_a"), parity.alias("p_a"))
    b = re_.select(F.col("r_regionkey").alias("key_b"), parity.alias("p_b"))
    return (
        a.join(b, a.p_a.eqNullSafe(b.p_b) & (a.key_a < b.key_b))
        .select("key_a", "key_b")
    )


@register(
    "subquery_correlated_max",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: each customer's most expensive order(s).
    Catalyst de-correlates this into an aggregate + join — no per-row
    re-execution."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6)        AS sqrt_price,
           round(ln(l_extendedprice + 1), 6)      AS ln_price,
           round(power(l_discount + 1, 3), 6)     AS pow_disc,
           abs(l_discount - 0.05)                 AS abs_off,
           CAST(sign(l_discount - 0.05) AS INT)   AS sign_off,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (sqrt/ln/pow/abs/sign/floor-bucket)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("pow_disc"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_off"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sign_off"),
        F.floor(F.col("l_quantity") / 10).alias("qty_bucket"),
    )


@register(
    "histogram_price_buckets",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)                    AS n,
           round(min(o_totalprice), 2)                 AS lo,
           round(max(o_totalprice), 2)                 AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram via arithmetic bucketing — the one-shuffle distribution
    profile that replaces driver-side describe() at scale."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "udf_registered_bytes",
    oracle="""
    SELECT doc_id,
           lower(hex(encode(substr(text, 1, 6)))) AS head_hex
    FROM documents
    """,
)
def udf_registered_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix-registered UDF surface under the gate: SQL calls
    ``u_bytes_to_hex`` (registered Python UDF — reference: etl/common/
    UdfRegister.scala:24-37) on binary slices."""
    from ..functions.binary import register_binary_functions

    register_binary_functions(spark, prefix="u_")
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT doc_id, u_bytes_to_hex(encode(substring(text, 1, 6), 'utf-8')) AS head_hex "
        "FROM documents"
    )


@register(
    "multimodal_decode_stub",
    # The fake codec is a deterministic function of md5(payload): width =
    # 16 + digest[0] % 64, height = 16 + digest[1] % 64, pixels = w*h*3
    # hash-seeded bytes (operators/multimodal.py:decode_images). DuckDB
    # md5(VARCHAR) hashes the UTF-8 bytes — identical input to the Spark
    # side's encode(text,'utf-8') — so digest bytes 0/1 are recoverable from
    # the hex digits and the whole mapInPandas output is hash-checkable.
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    wh AS (
      SELECT doc_id,
        CAST(16 + ((strpos('0123456789abcdef', substr(hx,1,1))-1)*16
                 + strpos('0123456789abcdef', substr(hx,2,1))-1) % 64 AS INT) AS width,
        CAST(16 + ((strpos('0123456789abcdef', substr(hx,3,1))-1)*16
                 + strpos('0123456789abcdef', substr(hx,4,1))-1) % 64 AS INT) AS height
      FROM h
    )
    SELECT doc_id AS id, width, height,
           CAST(3 AS INT)                        AS channels,
           'fake/rgb8'                           AS format,
           CAST(width * height * 3 AS INT)       AS n_pixel_bytes
    FROM wh
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over opaque binary payloads (fake
    codec — deterministic from content hash). The emitted pixel-payload
    length pins down the produced binary, so the driver's oracle hash checks
    the full decode plumbing, not just the row count."""
    from ..operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("payload")
    )
    out = decode_images(docs, fake=True)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.octet_length("pixels").cast("int").alias("n_pixel_bytes"),
    )


@register(
    "multimodal_decode_netpbm",
    # real codec, hash-checkable: each document becomes a REAL binary PPM
    # (P6, 4x2, maxval 255) whose raster is the first 24 bytes of an
    # md5-derived byte stream; decode_images(fake=False) parses the actual
    # header + raster, so width/height/channels/format/pixels all come from
    # the codec, and DuckDB reproduces the raster hex arithmetically.
    oracle="""
    SELECT doc_id                                            AS id,
           CAST(4 AS INT)                                    AS width,
           CAST(2 AS INT)                                    AS height,
           CAST(3 AS INT)                                    AS channels,
           'ppm/rgb8'                                        AS format,
           UPPER(md5(text) || SUBSTR(md5(text || 'x'), 1, 16)) AS pixels_hex
    FROM documents
    """,
)
def multimodal_decode_netpbm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the oracle gate — no image library: build a
    genuine binary netpbm P6 payload per document (ASCII header + 4x2 RGB
    raster derived from md5 so DuckDB can reproduce it), decode it with
    ``decode_images(fake=False)`` (numpy-only netpbm parser,
    operators/multimodal.py), and hash-check every decoded field including
    the raster bytes. Closes the decode gap for the formats PIL/ffmpeg
    emit as interchange (netpbm); compressed formats stay honestly gated.
    Arrow-batched mapInPandas, narrow — no shuffle at any scale.
    """
    from ..operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    raster_hex = F.concat(
        F.md5(txt), F.substring(F.md5(F.concat(txt, F.lit(b"x"))), 1, 16)
    )
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit(b"P6\n4 2\n255\n"), F.unhex(raster_hex)).alias("payload"),
    )
    out = decode_images(wire, fake=False)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.hex("pixels").alias("pixels_hex"),
    )


#: constant 54-byte BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER):
#: 3x2, 24-bit, uncompressed, bottom-up, data offset 54
#: (struct.pack'd once; both engines treat it as a literal)
_BMP_HEADER_HEX = (
    "424D4E0000000000000036000000280000000300000002000000010018000000"
    "000018000000130B0000130B00000000000000000000"
)

#: hex-char source order of the decoded top-down RGB raster, given an
#: 18-byte md5-derived source stream stored bottom-up in BGR with 4-byte
#: row padding: output row 0 = STORED row 1 (bytes 9-17), output row 1 =
#: STORED row 0 (bytes 0-8), each pixel's (b,g,r) emitted as (r,g,b).
_BMP_RGB_BYTE_ORDER = (11, 10, 9, 14, 13, 12, 17, 16, 15, 2, 1, 0, 5, 4, 3, 8, 7, 6)


@register(
    "multimodal_decode_bmp",
    # DuckDB replays the decode arithmetically: the raster source is
    # md5-recoverable hex, and bottom-up + BGR + padding reduce to a fixed
    # byte permutation of that source (see _BMP_RGB_BYTE_ORDER).
    oracle=f"""
    WITH r AS (
        SELECT doc_id,
               UPPER(md5(text) || SUBSTR(md5(text || 'x'), 1, 4)) AS rhx
        FROM documents
    )
    SELECT doc_id                 AS id,
           CAST(3 AS INT)         AS width,
           CAST(2 AS INT)         AS height,
           CAST(3 AS INT)         AS channels,
           'bmp/rgb8'             AS format,
           {" || ".join(f"SUBSTR(rhx, {2 * k + 1}, 2)" for k in _BMP_RGB_BYTE_ORDER)}
               AS pixels_hex
    FROM r
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode under the oracle gate — no image library: build a
    genuine uncompressed 24-bit BMP per document (54-byte header + 3x2
    BGR raster stored bottom-up with 4-byte row padding, bytes derived
    from md5 so DuckDB can reproduce them), decode with
    ``decode_images(fake=False)`` (operators/multimodal.py:_decode_bmp),
    and hash-check the normalized top-down RGB raster. The oracle's fixed
    byte permutation proves the decoder really undoes all three BMP
    quirks — row flip, channel swap, stride padding — not just the
    header parse. Arrow-batched mapInPandas, narrow: no shuffle."""
    from ..operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    src_hex = F.concat(
        F.md5(txt), F.substring(F.md5(F.concat(txt, F.lit(b"x"))), 1, 4)
    )
    stored = F.concat(
        F.substring(src_hex, 1, 18),  # stored (bottom) row: source bytes 0-8
        F.lit("000000"),  # stride padding to 12 bytes
        F.substring(src_hex, 19, 18),  # stored (top) row: source bytes 9-17
        F.lit("000000"),
    )
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.unhex(F.lit(_BMP_HEADER_HEX)), F.unhex(stored)).alias("payload"),
    )
    out = decode_images(wire, fake=False)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.hex("pixels").alias("pixels_hex"),
    )


#: constant 54-byte BMP header for the RLE8 query (BITMAPFILEHEADER +
#: BITMAPINFOHEADER): 8x4, 8-bit paletted, BI_RLE8 compression, 8 palette
#: entries, 40-byte pixel stream, data offset 86 (54 + 32-byte palette)
_BMP_RLE_HEADER_HEX = (
    "424D7E000000000000005600000028000000080000000400000001000800"
    "010000002800000000000000000000000800000000000000"
)


def _bmp_rle_pal6(k: int) -> str:
    """SQL for the 6-hex-char RGB of palette entry nib(k) (md5 nibble k
    folded into 0-7 by the same translate both engines apply)."""
    idx = f"(strpos('01234567', substr(ih, {k}, 1)) - 1)"
    return f"substr(pal, 6 * {idx} + 1, 6)"


def _bmp_rle_pixels_sql() -> str:
    """Expected top-down RGB hex of the RLE8 decode: display row i is
    STORED row 3-i (bottom-up). The four stored rows exercise every
    BI_RLE8 packet type the decoder handles:

    - row 0: two 4-pixel RUN packets (nibbles 1, 2)
    - row 1: a 5-index ABSOLUTE run (nibbles 3-7, odd count -> one word-
      padding byte the decoder must skip) then a 3-pixel run (nibble 8)
    - row 2: 2-pixel run (nibble 9), a DELTA jump of (+4, 0) — the
      skipped pixels stay palette index 0 — then a 2-pixel run (nib 10)
    - row 3: a 4-index ABSOLUTE run (nibbles 11-14, even count -> no
      padding) then a 4-pixel run (nibble 15)
    """
    p = _bmp_rle_pal6
    rows = {
        0: f"repeat({p(1)}, 4) || repeat({p(2)}, 4)",
        1: " || ".join(p(k) for k in range(3, 8)) + f" || repeat({p(8)}, 3)",
        2: f"repeat({p(9)}, 2) || repeat(substr(pal, 1, 6), 4) || repeat({p(10)}, 2)",
        3: " || ".join(p(k) for k in range(11, 15)) + f" || repeat({p(15)}, 4)",
    }
    return " || ".join(rows[3 - i] for i in range(4))


@register(
    "multimodal_decode_bmp_rle",
    # DuckDB replays the whole codec arithmetically: palette bytes and
    # packet indices are md5-recoverable, and expansion reduces to
    # repeat()/concat over palette slices — any decoder bug in run
    # expansion, absolute-mode copies (incl. the odd-count word-padding
    # skip), delta jumps (skipped pixels = entry 0), palette lookup
    # (BGRA->RGB), or the bottom-up flip breaks the pixel hash.
    oracle=f"""
    WITH r AS (
        SELECT doc_id,
               md5(text) || SUBSTR(md5(text || 'p'), 1, 16) AS pal,
               translate(md5(text || 'i'), '89abcdef', '01234567') AS ih
        FROM documents
    )
    SELECT doc_id          AS id,
           CAST(8 AS INT)  AS width,
           CAST(4 AS INT)  AS height,
           CAST(3 AS INT)  AS channels,
           'bmp/rle8'      AS format,
           UPPER({_bmp_rle_pixels_sql()}) AS pixels_hex
    FROM r
    """,
)
def multimodal_decode_bmp_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-raster decode under the oracle gate — stdlib+numpy
    only: each document becomes a genuine 8-bit paletted BMP with BI_RLE8
    compression (54-byte header + md5-derived 8-entry BGRA palette + a
    packet stream exercising EVERY BI_RLE8 packet type: run packets,
    absolute runs with and without the odd-count word-padding byte, a
    delta jump whose skipped pixels fall back to palette entry 0, and
    end-of-line / end-of-bitmap escapes), decoded by
    ``decode_images(fake=False)`` → ``_decode_bmp_rle8``
    (operators/multimodal.py): packet walk, palette expansion, bottom-up
    flip. Every output pixel hash-checks against DuckDB's arithmetic
    replay of the codec — the first COMPRESSED image format in the suite
    (JPEG/PNG still gate on PIL). Arrow-batched mapInPandas, narrow: no
    shuffle at any scale."""
    from ..operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    pal_hex = F.concat(
        F.md5(txt), F.substring(F.md5(F.concat(txt, F.lit(b"p"))), 1, 16)
    )
    # palette stored as BGRA: reorder each md5-derived RGB triple
    pal_bgra = F.concat(
        *[
            F.concat(
                F.substring(pal_hex, 6 * e + 5, 2),
                F.substring(pal_hex, 6 * e + 3, 2),
                F.substring(pal_hex, 6 * e + 1, 2),
                F.lit("00"),
            )
            for e in range(8)
        ]
    )
    # palette indices: md5 nibbles folded into palette range 0-7
    ih = F.translate(
        F.md5(F.concat(txt, F.lit(b"i"))), "89abcdef", "01234567"
    )

    def nib(k: int):
        # one palette-index byte (00-07) from nibble k
        return F.concat(F.lit("0"), F.substring(ih, k, 1))

    # the packet stream mirrors _bmp_rle_pixels_sql row by row: runs,
    # absolute (odd count -> word padding byte), delta jump, absolute
    # (even count), so every packet type is oracle-checked
    stream = F.concat(
        # stored row 0: two 4-pixel runs
        F.lit("04"), nib(1), F.lit("04"), nib(2), F.lit("0000"),
        # stored row 1: absolute(5) + pad + run(3)
        F.lit("0005"), nib(3), nib(4), nib(5), nib(6), nib(7), F.lit("00"),
        F.lit("03"), nib(8), F.lit("0000"),
        # stored row 2: run(2) + delta(+4,0) + run(2)
        F.lit("02"), nib(9), F.lit("00020400"), F.lit("02"), nib(10),
        F.lit("0000"),
        # stored row 3: absolute(4) + run(4)
        F.lit("0004"), nib(11), nib(12), nib(13), nib(14),
        F.lit("04"), nib(15), F.lit("0000"),
        F.lit("0001"),  # end of bitmap
    )
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.unhex(F.lit(_BMP_RLE_HEADER_HEX)),
            F.unhex(pal_bgra),
            F.unhex(stream),
        ).alias("payload"),
    )
    out = decode_images(wire, fake=False)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.hex("pixels").alias("pixels_hex"),
    )


#: GIF87a constants for the LZW query — header through the screen
#: descriptor (8x4, global color table of 8 entries, packed 0xF2 =
#: GCT flag | color-resolution 7 | size 2^(2+1)=8), and the image
#: descriptor + LZW minimum-code-size 3 + sub-block length 0x21 (33
#: bytes: 32 pixel bytes + the end-of-information byte)
_GIF_PRE_PAL_HEX = "474946383761" + "08000400" + "F2" + "0000"
_GIF_POST_PAL_HEX = "2C" + "00000000" + "08000400" + "00" + "03" + "21"


def _gif_pixels_sql() -> str:
    """Expected top-down RGB hex of the GIF decode: pixel k is palette
    entry nib(k) (GIF stores top-down — no flip; palette is plain RGB —
    no channel reorder)."""
    parts = []
    for k in range(1, 33):
        idx = f"(strpos('01234567', substr(ih, {k}, 1)) - 1)"
        parts.append(f"substr(pal, 6 * {idx} + 1, 6)")
    return " || ".join(parts)


@register(
    "multimodal_decode_gif_lzw",
    # DuckDB replays the wire AND the decode arithmetically. The LZW
    # stream interleaves a CLEAR code before every pixel code, so each
    # 4-bit-code pair packs LSB-first into exactly one byte (low nibble
    # 8 = clear, high nibble = the palette index) and the table never
    # grows — the expected pixel stream is a pure palette lookup per md5
    # nibble, while the decoder still runs its full LZW machinery (width
    # management, table reset, EOI) over every byte. Table-growth and
    # KwKwK paths are exercised by the unit tests' real encoder
    # (tests/test_operators_data.py).
    oracle=f"""
    WITH r AS (
        SELECT doc_id,
               md5(text) || SUBSTR(md5(text || 'p'), 1, 16) AS pal,
               translate(md5(text || 'i'), '89abcdef', '01234567') AS ih
        FROM documents
    )
    SELECT doc_id          AS id,
           CAST(8 AS INT)  AS width,
           CAST(4 AS INT)  AS height,
           CAST(3 AS INT)  AS channels,
           'gif/lzw'       AS format,
           UPPER({_gif_pixels_sql()}) AS pixels_hex
    FROM r
    """,
)
def multimodal_decode_gif_lzw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The suite's SECOND real compressed raster codec under the oracle
    gate — GIF87a with genuine LZW entropy coding, stdlib+numpy only:
    each document becomes a valid GIF (screen descriptor + md5-derived
    8-entry RGB color table + an LZW code stream), decoded by
    ``decode_images(fake=False)`` → ``_decode_gif_lzw``
    (operators/multimodal.py): block walk, sub-block reassembly, LSB-
    first variable-width code reading, clear/EOI handling, palette
    expansion. The generated stream clears before every pixel code so
    DuckDB can replay the decode arithmetically; dynamic-table growth,
    KwKwK self-reference and 12-bit width bumps are covered by the unit
    tests' real LZW encoder roundtrip. Arrow-batched mapInPandas,
    narrow: no shuffle at any scale."""
    from ..operators.multimodal import decode_images

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    # 8-entry RGB palette straight from the md5 hex (GIF color tables are
    # plain RGB — no BGRA reorder, unlike BMP)
    pal_hex = F.concat(
        F.md5(txt), F.substring(F.md5(F.concat(txt, F.lit(b"p"))), 1, 16)
    )
    ih = F.translate(
        F.md5(F.concat(txt, F.lit(b"i"))), "89abcdef", "01234567"
    )
    # one byte per pixel: LSB-first 4-bit codes (clear=8 low nibble, the
    # palette index high nibble), then the end-of-information byte 0x09
    stream = F.concat(
        *[
            F.concat(F.substring(ih, k, 1), F.lit("8"))
            for k in range(1, 33)
        ],
        F.lit("09"),
        F.lit("00"),  # block terminator
        F.lit("3B"),  # trailer
    )
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.unhex(F.lit(_GIF_PRE_PAL_HEX)),
            F.unhex(pal_hex),
            F.unhex(F.lit(_GIF_POST_PAL_HEX)),
            F.unhex(stream),
        ).alias("payload"),
    )
    out = decode_images(wire, fake=False)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.hex("pixels").alias("pixels_hex"),
    )


#: constant 44-byte RIFF/WAV header: format 7 (G.711 mu-law), mono,
#: 8000 Hz, 8-bit, 16 data bytes (struct.pack'd once)
_MULAW_HEADER_HEX = (
    "524946463400000057415645666D7420100000000700010040"
    "1F0000401F0000010008006461746110000000"
)


@register(
    "multimodal_audio_mulaw_decode",
    # mu-law expansion is exact integer arithmetic, so DuckDB replays the
    # codec per sample: recover each payload byte from the md5 hex, then
    # apply the same CCITT form the decoder uses (u = 255-b; t =
    # ((u&15)*8+132) << ((u>>4)&7); sign via u's high bit). One row per
    # sample (driver-hashable scalar schema; see queries/__init__ notes).
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (SELECT doc_id, CAST(g.i AS INT) AS idx,
                 255 - ((strpos('0123456789abcdef', hx[2*g.i+1]) - 1) * 16
                        + strpos('0123456789abcdef', hx[2*g.i+2]) - 1) AS u
          FROM h, (SELECT unnest(range(0, 16)) AS i) AS g)
    SELECT doc_id            AS id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(16 AS INT)   AS n_samples,
           idx,
           CAST(CASE WHEN u >= 128
                THEN 132 - ((((u % 16) * 8) + 132) * (1 << ((u // 16) % 8)))
                ELSE ((((u % 16) * 8) + 132) * (1 << ((u // 16) % 8))) - 132
                END AS INT) AS sample
    FROM b
    """,
)
def multimodal_audio_mulaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 mu-law audio decode under the oracle gate: each document
    becomes a genuine RIFF/WAV format-7 payload (constant header + its
    md5 digest as 16 mu-law bytes), decoded by
    ``decode_audio_mulaw`` (operators/multimodal.py) — chunk-walking RIFF
    parse, vectorized integer mu-law expansion — and every 16-bit sample
    is hash-checked against DuckDB's arithmetic replay of the codec.
    Narrow mapInPandas; no shuffle at any scale. The registered projection
    posexplodes the pcm array to one scalar row per sample (the driver's
    pandas canonicalizer cannot hash array cells); the operator API stays
    array-returning."""
    from ..operators.multimodal import decode_audio_mulaw

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.unhex(F.lit(_MULAW_HEADER_HEX)), F.unhex(F.md5(txt))).alias(
            "payload"
        ),
    )
    out = decode_audio_mulaw(wire)
    return out.select(
        "id",
        "sample_rate",
        "n_samples",
        F.posexplode("pcm").alias("idx", "sample"),
    ).select(
        "id",
        "sample_rate",
        "n_samples",
        F.col("idx").cast("int").alias("idx"),
        F.col("sample").cast("int").alias("sample"),
    )


#: constant 44-byte RIFF/WAV header: PCM, mono, 16-bit, 8000 Hz, 128 data
#: bytes (struct.pack'd once; both engines treat it as a literal)
_WAV_HEADER_HEX = (
    "52494646A400000057415645666D742010000000010001"
    "00401F0000803E0000020010006461746180000000"
)


@register(
    "multimodal_audio_wav_frames",
    # 128 PCM bytes = 8 md5 digests; 4 evenly spaced 32-byte frames start at
    # 0/32/64/96, i.e. hex offsets 1+64*i. sample_rate comes from the REAL
    # wave-module parse of the RIFF header, not a constant in the operator.
    oracle="""
    WITH p AS (
      SELECT doc_id,
             UPPER(md5(text||'0')||md5(text||'1')||md5(text||'2')||md5(text||'3')
                 ||md5(text||'4')||md5(text||'5')||md5(text||'6')||md5(text||'7'))
               AS pcm_hex
      FROM documents
    )
    SELECT doc_id                        AS id,
           CAST(f.i AS INT)              AS frame_idx,
           CAST(8000 AS INT)             AS sample_rate,
           SUBSTR(pcm_hex, 1 + 64*f.i, 64) AS frame_hex
    FROM p CROSS JOIN (VALUES (0),(1),(2),(3)) AS f(i)
    """,
)
def multimodal_audio_wav_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the oracle gate — stdlib only: wrap an
    md5-derived 128-byte PCM stream in a genuine RIFF/WAV header (constant
    for fixed geometry), decode with ``sample_audio_frames(fake=False)``
    (stdlib ``wave`` parses rate + frames), sample 4 evenly spaced 32-byte
    frames, and hash-check frame bytes AND the header-derived sample rate
    against DuckDB's arithmetic reconstruction. 1-to-N mapInPandas, narrow.
    """
    from ..operators.multimodal import sample_audio_frames

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    pcm_hex = F.concat(
        *[F.md5(F.concat(txt, F.lit(str(i).encode()))) for i in range(8)]
    )
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.unhex(F.lit(_WAV_HEADER_HEX)), F.unhex(pcm_hex)).alias("payload"),
    )
    out = sample_audio_frames(wire, n_frames=4, frame_bytes=32, fake=False)
    return out.select(
        "id", "frame_idx", "sample_rate", F.hex("frame").alias("frame_hex")
    )


@register(
    "multimodal_image_channel_stats",
    # per-channel stats over the SAME real P6 raster as
    # multimodal_decode_netpbm (24 bytes = 8 RGB pixels): channel c uses
    # bytes 3i+c; DuckDB recovers each byte from its two hex digits and
    # aggregates exactly (integer sums — no float anywhere).
    oracle="""
    WITH r AS (
        SELECT doc_id,
               lower(md5(text) || SUBSTR(md5(text || 'x'), 1, 16)) AS hx
        FROM documents
    ),
    b AS (
        SELECT doc_id, CAST(u.i AS INT) AS i,
               (strpos('0123456789abcdef', substr(hx, 2*u.i + 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(hx, 2*u.i + 2, 1)) - 1 AS byte
        FROM r, (SELECT unnest(range(0, 24)) AS i) AS u
    )
    SELECT doc_id AS id, CAST(i % 3 AS INT) AS channel,
           CAST(sum(byte) AS BIGINT) AS px_sum,
           CAST(min(byte) AS INT)    AS px_min,
           CAST(max(byte) AS INT)    AS px_max,
           CAST(count(*) AS INT)     AS n_px
    FROM b GROUP BY doc_id, i % 3
    """,
)
def multimodal_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction AFTER real decode: per-channel integer
    sum/min/max over the decoded P6 raster (numpy per Arrow batch,
    operators/multimodal.py:image_channel_stats) — decode and stats chain
    as two narrow mapInPandas stages, zero shuffles end-to-end."""
    from ..operators.multimodal import decode_images, image_channel_stats

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    raster_hex = F.concat(
        F.md5(txt), F.substring(F.md5(F.concat(txt, F.lit(b"x"))), 1, 16)
    )
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit(b"P6\n4 2\n255\n"), F.unhex(raster_hex)).alias("payload"),
    )
    return image_channel_stats(decode_images(wire, fake=False))


@register(
    "multimodal_tar_index",
    # fixed archive geometry (16- and 24-byte members each pad to one
    # 512 block): data offsets are constants, names derive from doc_id,
    # contents from md5 — DuckDB replays the whole index arithmetically.
    oracle="""
    SELECT doc_id AS id,
           'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS member_name,
           CAST(512 AS BIGINT)  AS data_offset,
           CAST(16 AS BIGINT)   AS size,
           UPPER(md5(text))     AS content_hex
    FROM documents
    UNION ALL
    SELECT doc_id,
           'doc' || CAST(doc_id AS VARCHAR) || '.bin',
           CAST(1536 AS BIGINT),
           CAST(24 AS BIGINT),
           UPPER(md5(text || 'x') || SUBSTR(md5(text || 'y'), 1, 16))
    FROM documents
    """,
)
def multimodal_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-shard indexing under the oracle gate: each document
    becomes a REAL USTAR archive (written by the stdlib tarfile module —
    two md5-derived members), then ``index_tar_members``
    (operators/multimodal.py) walks headers, validates checksums, and
    emits (name, offset, size, content) per member — the random-access
    index a 100 TB multimodal shard store needs. Parser is validated
    against a genuine tar writer, not its own inverse; every offset and
    content byte is hash-checked. Two chained narrow mapInPandas stages,
    no shuffle."""
    import hashlib
    import io
    import tarfile

    import pandas as pd

    from ..operators.multimodal import index_tar_members

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _pack(batches):
        for pdf in batches:
            rows = []
            for rid, txt in zip(pdf["doc_id"], pdf["text"]):
                t = txt.encode("utf-8")
                m1 = hashlib.md5(t).digest()
                m2 = (
                    hashlib.md5(t + b"x").digest()
                    + hashlib.md5(t + b"y").digest()[:8]
                )
                buf = io.BytesIO()
                tf = tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                )
                for name, data in (
                    (f"doc{rid}.txt", m1),
                    (f"doc{rid}.bin", m2),
                ):
                    ti = tarfile.TarInfo(name)
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.mode = 0o644
                    tf.addfile(ti, io.BytesIO(data))
                tf.close()
                rows.append({"id": int(rid), "payload": buf.getvalue()})
            yield pd.DataFrame(rows, columns=["id", "payload"])

    wire = docs.mapInPandas(_pack, "id bigint, payload binary")
    out = index_tar_members(wire)
    return out.select(
        "id",
        "member_name",
        "data_offset",
        "size",
        F.hex("content").alias("content_hex"),
    )


def _p5_8x8_wire(docs, seed_bytes):
    """(id, payload) wire frame: a REAL 8x8 binary P5 image whose 64
    raster bytes chain from md5(seed), md5(seed||x/y/z) — the one place
    the raster recipe lives, so the paired oracles can't drift from a
    missed copy."""
    raster_hex = F.concat(
        *[F.md5(F.concat(seed_bytes, F.lit(sfx))) for sfx in (b"", b"x", b"y", b"z")]
    )
    return docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit(b"P5\n8 8\n255\n"), F.unhex(raster_hex)).alias("payload"),
    )


@register(
    "multimodal_image_ahash",
    # 8x8 grayscale raster = 64 md5-derived bytes; mean = integer sum /
    # 64.0 (a power of two — the division is IEEE-exact, so the
    # threshold compare is engine-exact without rounding).
    oracle="""
    WITH h AS (
        SELECT doc_id,
               md5(text) || md5(text || 'x') || md5(text || 'y')
                         || md5(text || 'z') AS hx
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               list_transform(range(0, 64), i ->
                   (strpos('0123456789abcdef', hx[2*i+1]) - 1) * 16
                   + strpos('0123456789abcdef', hx[2*i+2]) - 1) AS px
        FROM h
    )
    SELECT doc_id AS id,
           array_to_string(list_transform(px, v ->
               CASE WHEN v > list_sum(px) / 64.0 THEN '1' ELSE '0' END), '')
               AS ahash_bits,
           list_sum(px) / 64.0 AS mean_px
    FROM b
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup fingerprint under the oracle gate: each
    document becomes a REAL 8x8 binary P5 grayscale image (64 md5-derived
    raster bytes), decoded by the netpbm codec, then average-hashed
    (operators/multimodal.py:image_ahash) — the Hamming-bucketable
    near-dup key for images, mirroring what SimHash does for text. Every
    bit and the exact mean are hash-checked against DuckDB's arithmetic
    replay. Two chained narrow mapInPandas stages, no shuffle."""
    from ..operators.multimodal import decode_images, image_ahash

    docs = load_table(spark, sf_dir, "documents")
    wire = _p5_8x8_wire(docs, F.encode("text", "utf-8"))
    return image_ahash(decode_images(wire, fake=False))


@register(
    "multimodal_audio_decimate",
    # mu-law expansion replay (same CCITT arithmetic as
    # multimodal_audio_mulaw_decode) + pair means; sums of integers over
    # a power-of-two factor are IEEE-exact, no rounding needed.
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    x AS (SELECT doc_id,
                 list_transform(
                   list_transform(range(0, 16), i ->
                     255 - ((strpos('0123456789abcdef', hx[2*i+1]) - 1) * 16
                            + strpos('0123456789abcdef', hx[2*i+2]) - 1)),
                   u -> CASE WHEN u >= 128
                        THEN 132 - ((((u % 16) * 8) + 132) * (1 << ((u // 16) % 8)))
                        ELSE ((((u % 16) * 8) + 132) * (1 << ((u // 16) % 8))) - 132
                        END) AS pcm
          FROM h)
    SELECT doc_id           AS id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(4000 AS INT) AS new_rate,
           CAST(16 AS INT)  AS n_samples,
           CAST(g.i AS INT)  AS idx,
           (CAST(pcm[2*g.i+1] AS DOUBLE) + CAST(pcm[2*g.i+2] AS DOUBLE)) / 2.0
               AS sample_ds
    FROM x, (SELECT unnest(range(0, 8)) AS i) AS g
    """,
)
def multimodal_audio_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio downsampling under the oracle gate: the mu-law payloads
    decode (REAL codec) and then decimate 2x with a boxcar mean filter
    (operators/multimodal.py:decimate_pcm — pure column expressions, no
    Python on the sample path). Every output sample is hash-checked
    against DuckDB's arithmetic replay of expansion + averaging. The
    registered projection posexplodes the downsampled array to scalar
    rows (driver-hashable schema); the operator API stays array-returning.
    """
    from ..operators.multimodal import decimate_pcm, decode_audio_mulaw

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    wire = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.unhex(F.lit(_MULAW_HEADER_HEX)), F.unhex(F.md5(txt))).alias(
            "payload"
        ),
    )
    out = decimate_pcm(decode_audio_mulaw(wire), factor=2)
    return out.select(
        "id",
        "sample_rate",
        "new_rate",
        "n_samples",
        F.posexplode("pcm_ds").alias("idx", "sample_ds"),
    ).select(
        "id",
        "sample_rate",
        "new_rate",
        "n_samples",
        F.col("idx").cast("int").alias("idx"),
        F.col("sample_ds").cast("double").alias("sample_ds"),
    )


@register(
    "multimodal_tar_pack_roundtrip",
    # our WRITER feeding our INDEXER: members sort by name, so doc{id}.bin
    # (24 bytes, data at offset 512) precedes doc{id}.txt (16 bytes, data
    # at 1536); DuckDB replays the geometry and contents arithmetically.
    oracle="""
    SELECT doc_id AS id,
           'doc' || CAST(doc_id AS VARCHAR) || '.bin' AS member_name,
           CAST(512 AS BIGINT)  AS data_offset,
           CAST(24 AS BIGINT)   AS size,
           UPPER(md5(text || 'x') || SUBSTR(md5(text || 'y'), 1, 16))
               AS content_hex
    FROM documents
    UNION ALL
    SELECT doc_id,
           'doc' || CAST(doc_id AS VARCHAR) || '.txt',
           CAST(1536 AS BIGINT),
           CAST(16 AS BIGINT),
           UPPER(md5(text))
    FROM documents
    """,
)
def multimodal_tar_pack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard WRITE path under the oracle gate: member rows
    pack into USTAR archives with our own writer
    (operators/multimodal.py:pack_tar_members — stdlib-tarfile-readable,
    unit-tested), then our indexer walks them back; every offset and
    content byte hash-checks. Write side is one groupBy(id) shuffle of
    member rows + a narrow pack; read side narrow."""
    from ..operators.multimodal import index_tar_members, pack_tar_members

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    members = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("n"),
                    F.unhex(F.md5(txt)).alias("c"),
                ),
                F.struct(
                    F.concat(F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".bin")).alias("n"),
                    F.unhex(
                        F.concat(
                            F.md5(F.concat(txt, F.lit(b"x"))),
                            F.substring(F.md5(F.concat(txt, F.lit(b"y"))), 1, 16),
                        )
                    ).alias("c"),
                ),
            )
        ).alias("m"),
    ).select("id", F.col("m.n").alias("member_name"), F.col("m.c").alias("content"))
    packed = pack_tar_members(members)
    out = index_tar_members(packed)
    return out.select(
        "id",
        "member_name",
        "data_offset",
        "size",
        F.hex("content").alias("content_hex"),
    )


@register(
    "multimodal_image_neardup_pairs",
    # image near-dup join: aHash bit strings band into 4x16-bit keys
    # (substring equi-join — the SimHash pigeonhole argument: Hamming
    # <= 3 guarantees one identical band), candidates verified by exact
    # Hamming distance. Rasters derive from the 80-char text PREFIX, so
    # template documents (shared boilerplate) produce identical images —
    # real positives, not hash accidents.
    oracle="""
    WITH h AS (
        SELECT doc_id,
               md5(substr(text, 1, 80)) || md5(substr(text, 1, 80) || 'x')
               || md5(substr(text, 1, 80) || 'y')
               || md5(substr(text, 1, 80) || 'z') AS hx
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               list_transform(range(0, 64), i ->
                   (strpos('0123456789abcdef', hx[2*i+1]) - 1) * 16
                   + strpos('0123456789abcdef', hx[2*i+2]) - 1) AS px
        FROM h
    ),
    ah AS (SELECT doc_id,
                  array_to_string(list_transform(px, v ->
                      CASE WHEN v > list_sum(px) / 64.0 THEN '1' ELSE '0' END),
                      '') AS bits
           FROM b),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
               a.bits AS ba, b2.bits AS bb
        FROM ah a JOIN ah b2
          ON a.doc_id < b2.doc_id
         AND (substr(a.bits, 1, 16) = substr(b2.bits, 1, 16)
           OR substr(a.bits, 17, 16) = substr(b2.bits, 17, 16)
           OR substr(a.bits, 33, 16) = substr(b2.bits, 33, 16)
           OR substr(a.bits, 49, 16) = substr(b2.bits, 49, 16))
    )
    SELECT id_a, id_b,
           CAST(len(list_filter(range(1, 65), i -> ba[i] <> bb[i])) AS INT)
               AS hamming
    FROM cand
    WHERE len(list_filter(range(1, 65), i -> ba[i] <> bb[i])) <= 3
    """,
)
def multimodal_image_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs end to end: real 8x8 grayscale decode →
    aHash → 4×16-bit band bucketing (the SimHash pigeonhole: Hamming ≤ 3
    guarantees a shared band) → exact Hamming verification. Rasters seed
    from each document's 80-char prefix, so boilerplate templates
    produce genuinely identical images. The band join is an equi-join on
    short keys; verification touches candidates only."""
    from ..operators.multimodal import decode_images, image_ahash

    docs = load_table(spark, sf_dir, "documents")
    wire = _p5_8x8_wire(docs, F.encode(F.substring("text", 1, 80), "utf-8"))
    ah = image_ahash(decode_images(wire, fake=False)).select(
        F.col("id").alias("doc_id"), F.col("ahash_bits").alias("bits")
    )
    # scale path: explode the 4 bands, then expand pairs IN-BUCKET from a
    # collect_list (the lsh_candidate_pairs shape) — a bucket self-join
    # would recompute the decode+aHash Python lineage on both sides and
    # shuffle twice; this runs the lineage ONCE with one aggregation
    # shuffle. Bits ride inside the bucket structs so no join-back.
    bands = ah.select(
        "doc_id",
        "bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.substring("bits", 1 + 16 * j, 16).alias("key"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("z"),
    ).select("doc_id", "bits", F.col("z.band").alias("band"), F.col("z.key").alias("key"))
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "bits"))).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, (x, i) -> "
                    "transform(slice(ms, i + 2, size(ms) - i - 1), "
                    "y -> struct(x.doc_id AS id_a, y.doc_id AS id_b, "
                    "x.bits AS ba, y.bits AS bb))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.ba", "p.bb")
        .distinct()
    )
    hamming = F.expr(
        "size(filter(sequence(1, 64), i -> substring(ba, i, 1) != substring(bb, i, 1)))"
    )
    return (
        cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


@register(
    "multimodal_video_frame_sample",
    # DuckDB replays the sampled frames arithmetically: frame k's 2x2 RGB
    # raster is the first 12 bytes of md5(text || ':' || k), and striding
    # (every 2nd frame from offset 1) keeps frames 1, 3, 5 of 6.
    oracle="""
    SELECT d.doc_id AS id,
           CAST(k AS INT)  AS frame_idx,
           CAST(6 AS INT)  AS n_frames,
           CAST(2 AS INT)  AS width,
           CAST(2 AS INT)  AS height,
           CAST(3 AS INT)  AS channels,
           UPPER(SUBSTR(md5(d.text || ':' || k), 1, 24)) AS pixels_hex
    FROM documents d, (VALUES (1), (3), (5)) AS f(k)
    """,
)
def multimodal_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame-sampling under the oracle gate: each document
    becomes a 6-frame raw video container (concatenated binary P6 frames
    — the image2pipe/yuv4mpeg shape; rasters md5-derived so DuckDB can
    reproduce them), and ``sample_video_frames`` strides every 2nd frame
    from offset 1, parsing real frame boundaries from the self-
    describing headers (operators/multimodal.py:_split_netpbm_frames).
    The dropped frames' bytes never leave the scan task — at 100 TB of
    video the sampled-raster output is the only thing that moves.
    Compressed containers (MP4/MKV) stay honestly gated on ffmpeg."""
    from ..operators.multimodal import sample_video_frames

    docs = load_table(spark, sf_dir, "documents")
    txt = F.encode("text", "utf-8")
    frames = [
        F.concat(
            F.lit(b"P6\n2 2\n255\n"),
            F.unhex(F.substring(F.md5(F.concat(txt, F.lit(f":{k}".encode()))), 1, 24)),
        )
        for k in range(6)
    ]
    wire = docs.select(F.col("doc_id").alias("id"), F.concat(*frames).alias("payload"))
    out = sample_video_frames(wire, every_n=2, offset=1)
    return out.select(
        "id",
        "frame_idx",
        "n_frames",
        "width",
        "height",
        "channels",
        F.hex("pixels").alias("pixels_hex"),
    )


@register(
    "multimodal_decode_png",
    # The decoder must invert REAL zlib DEFLATE and all five PNG
    # scanline filters to recover the md5-derived pixels; DuckDB only
    # replays the expected OUTPUT (the pixels are the md5 bytes by
    # construction), so the oracle is arithmetic while the Spark side
    # exercises the full codec: chunk CRCs, inflate + adler32, and the
    # None/Sub/Up/Average/Paeth inverses — one filter type per row.
    oracle="""
    SELECT doc_id          AS id,
           CAST(4 AS INT)  AS width,
           CAST(5 AS INT)  AS height,
           CAST(1 AS INT)  AS channels,
           'png/gray'      AS format,
           UPPER(md5(text) || SUBSTR(md5(text || 'x'), 1, 8)) AS pixels_hex
    FROM documents
    """,
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The suite's THIRD real compressed raster codec under the oracle
    gate — PNG with genuine DEFLATE entropy coding, stdlib zlib + numpy
    only: each document becomes a valid 4x5 grayscale PNG whose
    RECONSTRUCTED pixels are its md5 bytes, encoded with one scanline
    filter of each type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) and
    real zlib compression, then decoded by ``decode_images(fake=False)``
    → ``_decode_png`` (operators/multimodal.py): chunk walk with CRC-32
    verification, IDAT inflate (adler32-checked), filter inversion,
    and the recovered pixel stream must equal the md5 bytes exactly.
    Unlike the BMP-RLE8/GIF queries the payload generation itself runs
    compressed — zlib has no SQL form — so generation lives in the same
    Arrow-batched mapInPandas stage; the oracle replays the OUTPUT.
    Narrow plan: no shuffle at any scale."""
    import hashlib
    import struct
    import zlib

    from ..operators.multimodal import decode_images

    def _gen(batches):
        import numpy as np
        import pandas as pd

        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                px = (
                    hashlib.md5(raw).digest()
                    + hashlib.md5(raw + b"x").digest()[:4]
                )
                arr = np.frombuffer(px, np.uint8).reshape(5, 4).astype(np.int32)
                lines = bytearray()
                for y, ftype in enumerate((0, 1, 2, 3, 4)):
                    cur = arr[y]
                    above = arr[y - 1] if y > 0 else np.zeros(4, np.int32)
                    out = np.zeros(4, np.int32)
                    for x in range(4):
                        left = cur[x - 1] if x >= 1 else 0
                        up = above[x]
                        ul = above[x - 1] if x >= 1 else 0
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
                            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                            pred = (
                                left
                                if pa <= pb and pa <= pc
                                else up if pb <= pc else ul
                            )
                        out[x] = (cur[x] - pred) & 0xFF
                    lines += bytes([ftype]) + out.astype(np.uint8).tobytes()
                ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)
                payload = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(lines)))
                    + chunk(b"IEND", b"")
                )
                rows.append({"id": int(rid), "payload": payload})
            yield pd.DataFrame(rows, columns=["id", "payload"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wire = docs.mapInPandas(_gen, "id long, payload binary")
    out = decode_images(wire, fake=False)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.hex("pixels").alias("pixels_hex"),
    )


@register(
    "multimodal_decode_jpeg",
    # DC-only baseline JPEG with even block values and Q=16 decodes
    # EXACTLY (DC = 8*(v-128) quantizes by 16 without remainder for
    # even v), so DuckDB replays the expected pixels arithmetically —
    # each md5 byte (forced even) paints one constant 8x8 block — while
    # the decoder still runs its full machinery: marker walk, canonical
    # huffman decode of the DC categories + EOB symbols, dequant,
    # zigzag inversion, the exact IDCT. AC coefficients, subsampling,
    # restart intervals and error bounds are covered by the unit tests'
    # full baseline encoder (tests/test_operators_data.py).
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
        SELECT doc_id, g.i AS i,
               ((strpos('0123456789abcdef', hx[2*g.i+1]) - 1) * 16
                + strpos('0123456789abcdef', hx[2*g.i+2]) - 1) // 2 * 2 AS v
        FROM h, (SELECT unnest(range(0, 8)) AS i) AS g
    ),
    px AS (
        SELECT doc_id,
               string_agg(repeat(lpad(upper(to_hex(v)), 2, '0'), 8), ''
                          ORDER BY i) AS blocks
        FROM b WHERE i < 4 GROUP BY doc_id
    ),
    px2 AS (
        SELECT doc_id,
               string_agg(repeat(lpad(upper(to_hex(v)), 2, '0'), 8), ''
                          ORDER BY i) AS blocks
        FROM b WHERE i >= 4 GROUP BY doc_id
    )
    SELECT px.doc_id        AS id,
           CAST(32 AS INT)  AS width,
           CAST(16 AS INT)  AS height,
           CAST(1 AS INT)   AS channels,
           'jpeg/gray'      AS format,
           repeat(px.blocks, 8) || repeat(px2.blocks, 8) AS pixels_hex
    FROM px JOIN px2 ON px.doc_id = px2.doc_id
    """,
)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The suite's FOURTH real compressed codec under the oracle gate —
    baseline JPEG with genuine Huffman entropy coding and transform
    coding, stdlib + numpy only: each document becomes a valid SOF0
    JPEG (DQT all-16s, annex-K huffman tables, one DC-coded constant
    8x8 block per md5 byte forced even, 32x16 gray), decoded by
    ``decode_images(fake=False)`` → ``_decode_jpeg``
    (operators/multimodal.py): marker walk, canonical huffman decode
    with byte-stuffing handling, dequantization, zigzag inversion, the
    exact orthonormal IDCT, level shift — and the recovered raster must
    equal the md5-derived blocks byte for byte. AC run-lengths, 4:2:0
    chroma, restart intervals and lossy error bounds are pinned by the
    unit tests' full baseline encoder. Narrow plan: no shuffle."""
    import hashlib
    import struct

    from ..operators.multimodal import decode_images

    # annex-K standard DC luminance table: category t -> (length, code);
    # the AC table is a MINIMAL legal DHT — one 4-bit code for EOB, the
    # only AC symbol a DC-only stream emits
    dc_counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_symbols = list(range(12))
    ac_counts = [0, 0, 0, 1] + [0] * 12
    ac_symbols = [0x00]

    def codes(counts, symbols):
        out, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                out[symbols[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out

    dc = codes(dc_counts, dc_symbols)
    eob_len, eob_code = codes(ac_counts, ac_symbols)[0x00]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    head = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([16] * 64))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 32) + bytes([1, 1, 0x11, 0]))
        + seg(
            0xC4,
            bytes([0x00]) + bytes(dc_counts) + bytes(dc_symbols)
            + bytes([0x10]) + bytes(ac_counts) + bytes(ac_symbols),
        )
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["doc_id"], pdf["text"]):
                vals = [
                    b & 0xFE
                    for b in hashlib.md5(text.encode("utf-8")).digest()[:8]
                ]
                acc = n = 0
                bits = bytearray()

                def put(value, nbits):
                    nonlocal acc, n
                    for i in range(nbits - 1, -1, -1):
                        acc = (acc << 1) | ((value >> i) & 1)
                        n += 1
                        if n == 8:
                            bits.append(acc)
                            if acc == 0xFF:
                                bits.append(0x00)
                            acc = 0
                            n = 0

                pred = 0
                for v in vals:
                    dcq = (8 * (v - 128)) // 16  # exact for even v
                    diff = dcq - pred
                    pred = dcq
                    t = int(diff != 0 and abs(diff).bit_length())
                    ln, cd = dc[t]
                    put(cd, ln)
                    if t:
                        put(diff if diff > 0 else diff + (1 << t) - 1, t)
                    put(eob_code, eob_len)
                while n:
                    put(1, 1)
                rows.append(
                    {"id": int(rid), "payload": head + bytes(bits) + b"\xff\xd9"}
                )
            yield pd.DataFrame(rows, columns=["id", "payload"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wire = docs.mapInPandas(_gen, "id long, payload binary")
    out = decode_images(wire, fake=False)
    return out.select(
        "id",
        "width",
        "height",
        "channels",
        "format",
        F.hex("pixels").alias("pixels_hex"),
    )


@register(
    "multimodal_video_mjpeg_sample",
    # each document becomes a 4-frame MJPEG AVI whose frames are
    # constant DC-only JPEGs (md5 byte forced even -> exact decode);
    # striding keeps frames 0 and 2, so DuckDB replays the sampled
    # frames arithmetically: per doc, two rows whose 64 pixels all
    # carry the frame's md5-derived value
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    f AS (
        SELECT doc_id, CAST(g.i AS INT) AS frame_idx,
               ((strpos('0123456789abcdef', hx[2*g.i+1]) - 1) * 16
                + strpos('0123456789abcdef', hx[2*g.i+2]) - 1) // 2 * 2 AS v
        FROM h, (SELECT unnest([0, 2]) AS i) AS g
    )
    SELECT doc_id          AS id,
           frame_idx,
           CAST(4 AS INT)  AS n_frames,
           CAST(8 AS INT)  AS width,
           CAST(8 AS INT)  AS height,
           CAST(1 AS INT)  AS channels,
           repeat(lpad(upper(to_hex(v)), 2, '0'), 64) AS pixels_hex
    FROM f
    """,
)
def multimodal_video_mjpeg_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling a REAL compressed video container — MJPEG-in-AVI,
    no ffmpeg: each document becomes a RIFF/AVI whose movi LIST holds
    four DC-only baseline JPEGs (one per md5 byte, forced even for
    exact decode), interleaved with an audio chunk and an idx1 index
    the splitter must skip; ``sample_video_frames(every_n=2)`` walks
    the RIFF chunks (word alignment included), keeps frames 0 and 2,
    and decodes the kept frames through the native JPEG path
    (operators/multimodal.py:_split_avi_mjpeg_frames + _decode_jpeg).
    Dropped frames' bytes never leave the scan task — the 100 TB video
    contract. Narrow plan: no shuffle."""
    import hashlib
    import struct

    from ..operators.multimodal import sample_video_frames

    dc_counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_symbols = list(range(12))
    ac_counts = [0, 0, 0, 1] + [0] * 12
    ac_symbols = [0x00]

    def codes(counts, symbols):
        out, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                out[symbols[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out

    dc = codes(dc_counts, dc_symbols)
    eob_len, eob_code = codes(ac_counts, ac_symbols)[0x00]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    head = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([16] * 64))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(
            0xC4,
            bytes([0x00]) + bytes(dc_counts) + bytes(dc_symbols)
            + bytes([0x10]) + bytes(ac_counts) + bytes(ac_symbols),
        )
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )

    def jpeg_const(v: int) -> bytes:
        acc = n = 0
        bits = bytearray()

        def put(value, nbits):
            nonlocal acc, n
            for i in range(nbits - 1, -1, -1):
                acc = (acc << 1) | ((value >> i) & 1)
                n += 1
                if n == 8:
                    bits.append(acc)
                    if acc == 0xFF:
                        bits.append(0x00)
                    acc = 0
                    n = 0

        diff = (8 * (v - 128)) // 16
        t = int(diff != 0 and abs(diff).bit_length())
        ln, cd = dc[t]
        put(cd, ln)
        if t:
            put(diff if diff > 0 else diff + (1 << t) - 1, t)
        put(eob_code, eob_len)
        while n:
            put(1, 1)
        return head + bytes(bits) + b"\xff\xd9"

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["doc_id"], pdf["text"]):
                vals = [
                    b & 0xFE
                    for b in hashlib.md5(text.encode("utf-8")).digest()[:4]
                ]
                movi = b"movi"
                for i, v in enumerate(vals):
                    movi += chunk(b"00dc", jpeg_const(v))
                    if i == 1:  # foreign chunks the walker must skip
                        movi += chunk(b"01wb", b"audio-bytes")
                movi += chunk(b"idx1", b"\x00" * 16)
                body = b"AVI " + chunk(b"LIST", movi)
                avi = b"RIFF" + struct.pack("<I", len(body)) + body
                rows.append({"id": int(rid), "payload": avi})
            yield pd.DataFrame(rows, columns=["id", "payload"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wire = docs.mapInPandas(_gen, "id long, payload binary")
    out = sample_video_frames(wire, every_n=2)
    return out.select(
        "id",
        "frame_idx",
        "n_frames",
        "width",
        "height",
        "channels",
        F.hex("pixels").alias("pixels_hex"),
    )


@register(
    "multimodal_audio_flac_decode",
    # FLAC is LOSSLESS, so the oracle replays the expected samples
    # directly from the md5 hex: each pair of md5 bytes is one signed
    # 16-bit big-endian sample; the decoder must undo the Rice coding
    # and the order-1 fixed predictor to recover them exactly. One row
    # per sample (driver-hashable scalar schema).
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    s AS (
        SELECT doc_id, CAST(g.i AS INT) AS idx,
               (strpos('0123456789abcdef', hx[4*g.i+1]) - 1) * 4096
             + (strpos('0123456789abcdef', hx[4*g.i+2]) - 1) * 256
             + (strpos('0123456789abcdef', hx[4*g.i+3]) - 1) * 16
             + (strpos('0123456789abcdef', hx[4*g.i+4]) - 1) AS u
        FROM h, (SELECT unnest(range(0, 8)) AS i) AS g
    )
    SELECT doc_id            AS id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(8 AS INT)    AS n_samples,
           idx,
           CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS INT) AS pcm
    FROM s
    """,
)
def multimodal_audio_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed lossless audio under the oracle gate — FLAC,
    stdlib-only: each document's md5 becomes eight signed 16-bit
    samples, Rice-coded behind an order-1 fixed predictor into a valid
    FLAC stream (STREAMINFO + one frame with header CRC-8 and frame
    CRC-16), then decoded by ``_decode_flac``
    (operators/multimodal.py): sync + header parse, CRC verification,
    subframe decode, Rice de-zigzag, predictor reconstruction — and the
    recovered samples must equal the md5-derived ones bit for bit.
    Stereo decorrelation (left/side, mid/side), LPC subframes,
    verbatim-escape partitions and wasted bits are pinned by the unit
    tests (tests/test_operators_data.py). Narrow plan: no shuffle."""
    import hashlib

    from ..operators.multimodal import _crc8, _crc16, _decode_flac

    def _gen_and_decode(batches):
        import pandas as pd

        def encode(samples):
            out = bytearray()
            acc = [0, 0]  # acc value, nbits

            def put(value, nbits):
                for i in range(nbits - 1, -1, -1):
                    acc[0] = (acc[0] << 1) | ((value >> i) & 1)
                    acc[1] += 1
                    if acc[1] == 8:
                        out.append(acc[0])
                        acc[0] = acc[1] = 0

            n = len(samples)
            put(n, 16); put(n, 16); put(0, 24); put(0, 24)
            put(8000, 20); put(0, 3); put(15, 5); put(n, 36)
            si = bytes(out) + b"\x00" * 16
            head = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si

            out.clear(); acc[0] = acc[1] = 0
            put(0x3FFE, 14); put(0, 1); put(0, 1)
            put(7, 4); put(0, 4); put(0, 4); put(0, 3); put(0, 1)
            put(0, 8)  # frame 0
            put(n - 1, 16)
            hdr = bytes(out)
            put(_crc8(hdr), 8)
            put(0, 1); put(9, 6); put(0, 1)  # FIXED order 1
            put(samples[0] & 0xFFFF, 16)  # warmup
            put(0, 2); put(0, 4); put(14, 4)  # rice method 0, 1 part, p=14
            for i in range(1, n):
                e = samples[i] - samples[i - 1]
                u = (e << 1) if e >= 0 else ((-e) << 1) - 1
                for _ in range(u >> 14):
                    put(0, 1)
                put(1, 1)
                put(u & 0x3FFF, 14)
            while acc[1]:
                put(0, 1)
            body = bytes(out)
            put(_crc16(body), 16)
            return head + bytes(out)

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["doc_id"], pdf["text"]):
                dig = hashlib.md5(text.encode("utf-8")).digest()
                samples = []
                for i in range(8):
                    u = (dig[2 * i] << 8) | dig[2 * i + 1]
                    samples.append(u - 65536 if u >= 32768 else u)
                rate, _nch, _bps, chans = _decode_flac(encode(samples))
                for idx, pcm in enumerate(chans[0]):
                    rows.append(
                        {
                            "id": int(rid),
                            "sample_rate": int(rate),
                            "n_samples": len(chans[0]),
                            "idx": idx,
                            "pcm": int(pcm),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "n_samples", "idx", "pcm"]
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        _gen_and_decode,
        "id long, sample_rate int, n_samples int, idx int, pcm int",
    )
