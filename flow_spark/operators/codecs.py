"""Body codecs: base64 encode/decode, compression, meta parsing.

Reference:
- x/encoder_base64.go:59-70, x/decoder_base64.go:59-76 — std base64 over
  the body; decode errors -> MsgStatusInvalid.
- actor/compressor.go:19-87 — gzip/flate/lzw/zlib/zstd/snappy at a
  configurable level over the body.
- x/meta_parser.go:72-88 — body split at the first space; the left part is
  parsed as a URL query string into meta (multi-values joined with ","),
  the remainder becomes the body.

Spark mapping: base64/unbase64 are built-ins (JVM-side); compression has no
Catalyst primitive so it's an Arrow-batched Pandas UDF over BinaryType
(the sanctioned slow path — storage-level compression should use parquet /
kafka codecs instead, this operator exists for wire-format parity);
meta parsing is split + str_to_map + map_concat, all codegen'd.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib
from collections.abc import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

# --- base64 (JVM-side) ----------------------------------------------------


def encode_base64(body: Column) -> Column:
    return F.base64(body)


def decode_base64(b64: Column) -> Column:
    """Strict-ish decode: Spark's unbase64 is lenient, so validate the
    alphabet first and yield NULL (-> status 'invalid') on garbage,
    matching decoder_base64.go's error path."""
    valid = b64.rlike(r"^[A-Za-z0-9+/]*={0,2}$")
    return F.when(valid, F.unbase64(b64))


# --- compression (Pandas UDF) ----------------------------------------------

def _flate_compress(b: bytes) -> bytes:
    """Raw DEFLATE (zlib without header/checksum) — Go's compress/flate."""
    c = zlib.compressobj(wbits=-15)
    return c.compress(b) + c.flush()


def _flate_decompress(b: bytes) -> bytes:
    return zlib.decompressobj(wbits=-15).decompress(b)


def _lzw_compress(b: bytes) -> bytes:
    """LZW, 12-bit cap with clear code (compressor.go's lzw entry; the
    classic GIF/compress variant, LSB-first).  Pure Python: this codec
    exists for operator parity, not throughput — use zstd/gzip in anger."""
    max_code = (1 << 12) - 1
    table = {bytes([i]): i for i in range(256)}
    clear, eof = 256, 257
    next_code = 258
    out = bytearray()
    bitbuf = bitcnt = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    emit(clear)
    w = b""
    for ch in b:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code <= max_code:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(eof)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decompress(b: bytes) -> bytes:
    clear, eof = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    bitbuf = bitcnt = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int | None:
        nonlocal bitbuf, bitcnt, pos
        while bitcnt < width:
            if pos >= len(b):
                return None
            bitbuf |= b[pos] << bitcnt
            pos += 1
            bitcnt += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        return code

    while True:
        code = read_code()
        if code is None or code == eof:
            break
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif prev is not None and code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < (1 << 12):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


_COMPRESSORS: dict[str, tuple[Callable[[bytes], bytes], Callable[[bytes], bytes]]] = {
    "gzip": (lambda b: gzip.compress(b, mtime=0), gzip.decompress),
    "zlib": (zlib.compress, zlib.decompress),
    "flate": (_flate_compress, _flate_decompress),
    "lzw": (_lzw_compress, _lzw_decompress),
    "bz2": (bz2.compress, bz2.decompress),
    "lzma": (lzma.compress, lzma.decompress),
}
# reference also supports zstd/snappy (compressor.go:61-76); prefer the
# dedicated libs when present, else fall back to pyarrow's bundled codecs
# (same wire formats: standard zstd frame, raw snappy block whose uvarint
# preamble carries the uncompressed length — what Go's snappy.Encode emits)
try:  # pragma: no cover
    import zstandard

    _COMPRESSORS["zstd"] = (
        lambda b: zstandard.ZstdCompressor().compress(b),
        lambda b: zstandard.ZstdDecompressor().decompress(b),
    )
except ImportError:
    pass
try:  # pragma: no cover
    import snappy

    _COMPRESSORS["snappy"] = (snappy.compress, snappy.decompress)
except ImportError:
    pass


def _snappy_raw_len(b: bytes) -> int:
    """Uncompressed length from the raw-block uvarint preamble."""
    n = shift = i = 0
    while True:
        if i >= len(b):
            raise ValueError("truncated snappy preamble")
        byte = b[i]
        n |= (byte & 0x7F) << shift
        i += 1
        shift += 7
        if not byte & 0x80:
            return n


try:
    import pyarrow as _pa

    def _pa_compress(name: str, b: bytes) -> bytes:
        import pyarrow as pa

        return pa.Codec(name).compress(b, asbytes=True)

    def _pa_zstd_decompress(b: bytes) -> bytes:
        # streaming reader: size-agnostic (content-size header optional)
        import pyarrow as pa

        return pa.input_stream(pa.BufferReader(b), compression="zstd").read()

    def _pa_snappy_decompress(b: bytes) -> bytes:
        import pyarrow as pa

        return pa.Codec("snappy").decompress(
            b, decompressed_size=_snappy_raw_len(b), asbytes=True
        )

    if "zstd" not in _COMPRESSORS and _pa.Codec.is_available("zstd"):
        _COMPRESSORS["zstd"] = (
            lambda b: _pa_compress("zstd", b),
            _pa_zstd_decompress,
        )
    if "snappy" not in _COMPRESSORS and _pa.Codec.is_available("snappy"):
        _COMPRESSORS["snappy"] = (
            lambda b: _pa_compress("snappy", b),
            _pa_snappy_decompress,
        )
except ImportError:  # pragma: no cover
    pass


def supported_codecs() -> tuple[str, ...]:
    return tuple(sorted(_COMPRESSORS))


def compress(body: Column, codec: str = "gzip") -> Column:
    if codec not in _COMPRESSORS:
        raise ValueError(f"unsupported codec {codec!r}; have {supported_codecs()}")
    comp, _ = _COMPRESSORS[codec]

    @F.pandas_udf(BinaryType())
    def _compress(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else comp(bytes(b)))

    return _compress(body)


def decompress(body: Column, codec: str = "gzip") -> Column:
    if codec not in _COMPRESSORS:
        raise ValueError(f"unsupported codec {codec!r}; have {supported_codecs()}")
    _, decomp = _COMPRESSORS[codec]

    @F.pandas_udf(BinaryType())
    def _decompress(s: pd.Series) -> pd.Series:
        def safe(b):
            if b is None:
                return None
            try:
                return decomp(bytes(b))
            except Exception:
                return None  # -> status 'invalid'

        return s.map(safe)

    return _decompress(body)


# --- meta parser ------------------------------------------------------------


def parse_meta(df: DataFrame, body_col: str = "body_str") -> DataFrame:
    """Split body at the first space; parse the left part as a querystring
    into meta (merged over existing meta, parsed keys win); the remainder
    becomes the body.  meta_parser.go:72-88 semantics; %20 decoded.
    """
    head = F.split_part(F.col(body_col), F.lit(" "), F.lit(1))
    rest = F.substring(
        F.col(body_col), F.length(head) + 2, F.length(F.col(body_col))
    )
    parsed = F.str_to_map(F.url_decode(head), F.lit("&"), F.lit("="))
    # merge: parsed keys win over pre-existing meta keys (map_concat would
    # reject duplicates); map_zip_with covers keys present in either map
    merged = F.map_zip_with(F.col("meta"), parsed, lambda k, old, new: F.coalesce(new, old))
    return (
        df.withColumn("meta", merged)
        .withColumn(body_col, rest)
        .withColumn("body", F.col(body_col).cast("binary"))
    )
