"""Prometheus TSDB block importer — the vmctl file-mode migration path.

The reference migrates Prometheus data via ``vmctl prometheus``
(app/vmctl/prometheus/prometheus.go), which walks TSDB block
directories and replays their samples.  This module reads the same
on-disk format natively, from its public specification
(prometheus/tsdb/docs/format/{index,chunks}.md and the Gorilla XOR
chunk encoding from the Facebook Gorilla paper / prometheus
tsdb/chunkenc/xor.go semantics):

block dir::

    <ulid>/
      meta.json            ulid, minTime/maxTime (ms), stats
      index                symbol table + series index (+ postings)
      chunks/000001        XOR-compressed sample chunks
      tombstones           deletion markers (ignored here)

Scale design: the *index* of a block is small (series metadata), the
*chunks* hold the bulk bytes.  ``block_samples_df`` parses indexes
driver-side into a chunk-ref DataFrame (one row per chunk:
labels + segment path + offset), then decodes chunks inside
``mapInPandas`` executors — each task seeks directly into its segment
file, so a 1000-executor cluster fans out over chunks with no shuffle
and no driver bottleneck.  Time-range pruning happens on the chunk
refs (each carries mint/maxt) BEFORE any chunk byte is read.

A spec-complete block *writer* (``write_tsdb_block``) supports
round-trip tests and TSDB-format export; it emits the full symbol
table, sorted series section, the all-postings list and offset tables.
"""

from __future__ import annotations

import json
import math
import os
import struct
from typing import Iterable, Iterator

INDEX_MAGIC = 0xBAAAD700
CHUNKS_MAGIC = 0x85BD40DD
TOMBSTONES_MAGIC = 0x0130BA30
XOR_ENCODING = 1

# ------------------------------------------------------------- CRC32C
# Castagnoli CRC32 (the TSDB format's checksum), table-driven.
_CRC32C_POLY = 0x82F63B78
_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------------------- varints
def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos  # zigzag decode


def _put_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _put_varint(v: int) -> bytes:
    return _put_uvarint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


# ------------------------------------------------------ XOR bitstream
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.nbits = 0  # bits used in the last byte (0 => need new byte)

    def write_bit(self, bit: int) -> None:
        if self.nbits == 0:
            self.buf.append(0)
            self.nbits = 8
        self.nbits -= 1
        if bit:
            self.buf[-1] |= 1 << self.nbits

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bit((v >> i) & 1)

    def write_byte(self, b: int) -> None:
        self.write_bits(b, 8)

    def write_uvarint_bytes(self, v: int) -> None:
        for b in _put_uvarint(v):
            self.write_byte(b)

    def write_varint_bytes(self, v: int) -> None:
        for b in _put_varint(v):
            self.write_byte(b)


class _BitReader:
    def __init__(self, buf: bytes, pos_bits: int = 0) -> None:
        self.buf = buf
        self.pos = pos_bits

    def read_bit(self) -> int:
        byte = self.buf[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            out = (out << 1) | self.read_bit()
        return out

    def read_byte(self) -> int:
        return self.read_bits(8)

    def read_uvarint(self) -> int:
        out = shift = 0
        while True:
            b = self.read_byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def read_varint(self) -> int:
        u = self.read_uvarint()
        return (u >> 1) ^ -(u & 1)


_F64 = struct.Struct(">d")
_U64 = struct.Struct(">Q")


def _f2u(v: float) -> int:
    return _U64.unpack(_F64.pack(v))[0]


def _u2f(u: int) -> float:
    return _F64.unpack(_U64.pack(u))[0]


def encode_xor_chunk(samples: list[tuple[int, float]]) -> bytes:
    """Gorilla XOR chunk: uint16 BE count, then the delta-of-delta
    timestamp stream + XOR float stream (tsdb/chunkenc/xor.go layout)."""
    w = _BitWriter()
    w.write_byte(len(samples) >> 8)
    w.write_byte(len(samples) & 0xFF)
    prev_t = prev_td = 0
    prev_v = 0.0
    leading, trailing = 0xFF, 0
    for i, (t, v) in enumerate(samples):
        if i == 0:
            w.write_varint_bytes(t)
            w.write_bits(_f2u(v), 64)
        elif i == 1:
            td = t - prev_t
            w.write_uvarint_bytes(td)
            leading, trailing = _write_xor(w, v, prev_v, leading, trailing)
            prev_td = td
        else:
            td = t - prev_t
            dod = td - prev_td
            if dod == 0:
                w.write_bit(0)
            elif -8191 <= dod <= 8192:  # 14-bit two's-complement range
                w.write_bits(0b10, 2)
                w.write_bits(dod & 0x3FFF, 14)
            elif -65535 <= dod <= 65536:
                w.write_bits(0b110, 3)
                w.write_bits(dod & 0x1FFFF, 17)
            elif -524287 <= dod <= 524288:
                w.write_bits(0b1110, 4)
                w.write_bits(dod & 0xFFFFF, 20)
            else:
                w.write_bits(0b1111, 4)
                w.write_bits(dod & ((1 << 64) - 1), 64)
            leading, trailing = _write_xor(w, v, prev_v, leading, trailing)
            prev_td = td
        prev_t, prev_v = t, v
    return bytes(w.buf)


def _write_xor(
    w: _BitWriter, v: float, prev_v: float, leading: int, trailing: int
) -> tuple[int, int]:
    delta = _f2u(v) ^ _f2u(prev_v)
    if delta == 0:
        w.write_bit(0)
        return leading, trailing
    w.write_bit(1)
    nl = 64 - delta.bit_length()
    if nl >= 32:  # clamp so 5 bits suffice
        nl = 31
    nt = (delta & -delta).bit_length() - 1
    if leading != 0xFF and nl >= leading and nt >= trailing:
        w.write_bit(0)
        w.write_bits(delta >> trailing, 64 - leading - trailing)
        return leading, trailing
    w.write_bit(1)
    w.write_bits(nl, 5)
    sig = 64 - nl - nt
    w.write_bits(sig & 0x3F, 6)  # 64 encodes as 0
    w.write_bits(delta >> nt, sig)
    return nl, nt


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    n = (data[0] << 8) | data[1]
    r = _BitReader(data, 16)
    out: list[tuple[int, float]] = []
    t = td = 0
    vbits = 0
    leading = trailing = 0
    for i in range(n):
        if i == 0:
            t = r.read_varint()
            vbits = r.read_bits(64)
        elif i == 1:
            td = r.read_uvarint()
            t += td
            vbits, leading, trailing = _read_xor(r, vbits, leading, trailing)
        else:
            if r.read_bit() == 0:
                dod = 0
            elif r.read_bit() == 0:
                dod = _sign_extend(r.read_bits(14), 14)
            elif r.read_bit() == 0:
                dod = _sign_extend(r.read_bits(17), 17)
            elif r.read_bit() == 0:
                dod = _sign_extend(r.read_bits(20), 20)
            else:
                dod = _sign_extend(r.read_bits(64), 64)
            td += dod
            t += td
            vbits, leading, trailing = _read_xor(r, vbits, leading, trailing)
        out.append((t, _u2f(vbits)))
    return out


def _sign_extend(v: int, bits: int) -> int:
    # the writer's bitRange admits (-2^(b-1), 2^(b-1)]; values strictly
    # above 2^(b-1) wrap negative (xor.go: "if bits > 1<<(sz-1)")
    return v - (1 << bits) if v > (1 << (bits - 1)) else v


def _read_xor(
    r: _BitReader, vbits: int, leading: int, trailing: int
) -> tuple[int, int, int]:
    if r.read_bit() == 0:
        return vbits, leading, trailing
    if r.read_bit():
        leading = r.read_bits(5)
        sig = r.read_bits(6)
        if sig == 0:
            sig = 64
        trailing = 64 - leading - sig
    sig = 64 - leading - trailing
    delta = r.read_bits(sig) << trailing
    return vbits ^ delta, leading, trailing


# ----------------------------------------------------------- block read
def read_meta(block_dir: str) -> dict:
    with open(os.path.join(block_dir, "meta.json")) as f:
        return json.load(f)


def _read_toc(index: bytes) -> dict:
    toc = index[-52:]
    if crc32c(toc[:48]) != struct.unpack(">I", toc[48:])[0]:
        raise ValueError("index TOC checksum mismatch")
    refs = struct.unpack(">6Q", toc[:48])
    return dict(
        zip(
            (
                "symbols",
                "series",
                "label_indices",
                "label_offset_table",
                "postings",
                "postings_offset_table",
            ),
            refs,
        )
    )


def _read_symbols(index: bytes, off: int) -> list[str]:
    ln, n = struct.unpack(">II", index[off : off + 8])
    pos = off + 8
    out = []
    for _ in range(n):
        sl, pos = _uvarint(index, pos)
        out.append(index[pos : pos + sl].decode("utf-8"))
        pos += sl
    return out


def read_block_index(
    block_dir: str,
) -> list[tuple[dict[str, str], list[tuple[int, int, int, int]]]]:
    """Parse the block index into
    [(labels, [(segment, offset, mint, maxt), ...])] by walking the
    16-byte-aligned series section (index format v2)."""
    with open(os.path.join(block_dir, "index"), "rb") as f:
        index = f.read()
    magic, version = struct.unpack(">IB", index[:5])
    if magic != INDEX_MAGIC:
        raise ValueError(f"bad index magic {magic:#x}")
    if version not in (1, 2):
        raise ValueError(f"unsupported index version {version}")
    toc = _read_toc(index)
    symbols = _read_symbols(index, toc["symbols"])
    # series section ends at the next section's start
    end_candidates = [
        v
        for k, v in toc.items()
        if k != "series" and v > toc["series"]
    ]
    series_end = min(end_candidates) if end_candidates else len(index) - 52
    out = []
    pos = (toc["series"] + 15) // 16 * 16
    while pos < series_end:
        ln, p = _uvarint(index, pos)
        if ln == 0:  # zero padding at section end
            pos += 16
            continue
        content = index[p : p + ln]
        if crc32c(content) != struct.unpack(">I", index[p + ln : p + ln + 4])[0]:
            raise ValueError(f"series entry checksum mismatch at {pos}")
        cpos = 0
        nlabels, cpos = _uvarint(content, cpos)
        labels = {}
        for _ in range(nlabels):
            kref, cpos = _uvarint(content, cpos)
            vref, cpos = _uvarint(content, cpos)
            labels[symbols[kref]] = symbols[vref]
        nchunks, cpos = _uvarint(content, cpos)
        chunks = []
        mint = maxt = ref = 0
        for ci in range(nchunks):
            if ci == 0:
                mint, cpos = _varint(content, cpos)
                span, cpos = _uvarint(content, cpos)
                ref, cpos = _uvarint(content, cpos)
            else:
                dmint, cpos = _varint(content, cpos)
                mint = maxt + dmint
                span, cpos = _uvarint(content, cpos)
                dref, cpos = _varint(content, cpos)
                ref += dref
            maxt = mint + span
            chunks.append((ref >> 32, ref & 0xFFFFFFFF, mint, maxt))
        out.append((labels, chunks))
        pos = (p + ln + 4 + 15) // 16 * 16
    return out


def read_chunk(segment_path: str, offset: int) -> list[tuple[int, float]]:
    """Decode one chunk from a chunks segment file at the given offset
    (the ref's lower 4 bytes): uvarint len, encoding byte, data, CRC."""
    with open(segment_path, "rb") as f:
        f.seek(offset)
        head = f.read(10)
        ln, n = _uvarint(head, 0)
        f.seek(offset + n)
        body = f.read(ln + 5)
    enc, data, crc = body[0], body[1 : 1 + ln], body[1 + ln : 5 + ln]
    if crc32c(body[: 1 + ln]) != struct.unpack(">I", crc)[0]:
        raise ValueError(f"chunk checksum mismatch at {offset}")
    if enc != XOR_ENCODING:
        raise ValueError(f"unsupported chunk encoding {enc}")
    return decode_xor_chunk(data)


def iter_block_samples(
    block_dir: str,
) -> Iterator[tuple[dict[str, str], int, float]]:
    """Driver-side convenience: yield (labels, ts_ms, value) for every
    sample in the block (test-sized blocks)."""
    for labels, chunks in read_block_index(block_dir):
        for seg, off, _mint, _maxt in chunks:
            path = os.path.join(block_dir, "chunks", f"{seg + 1:06d}")
            for t, v in read_chunk(path, off):
                yield labels, t, v


def block_samples_df(
    spark,
    block_dirs: list[str] | str,
    min_ts: int | None = None,
    max_ts: int | None = None,
):
    """Distributed block read: index parse driver-side (small), chunk
    decode executor-side via mapInPandas (bulk).  Returns the canonical
    sample frame (name, labels, ts, value).  Chunk refs outside
    [min_ts, max_ts] are pruned before any chunk byte is read —
    the block-level analog of parquet partition pruning."""
    import pandas as pd
    from pyspark.sql import functions as F

    if isinstance(block_dirs, str):
        block_dirs = [block_dirs]
    refs = []
    for bd in block_dirs:
        for labels, chunks in read_block_index(bd):
            lj = json.dumps(labels, sort_keys=True)
            for seg, off, mint, maxt in chunks:
                if min_ts is not None and maxt < min_ts:
                    continue
                if max_ts is not None and mint > max_ts:
                    continue
                refs.append(
                    (
                        lj,
                        os.path.join(bd, "chunks", f"{seg + 1:06d}"),
                        off,
                    )
                )
    ref_df = spark.createDataFrame(
        refs, "labels_json string, path string, offset long"
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for lj, path, off in zip(
                pdf["labels_json"], pdf["path"], pdf["offset"]
            ):
                labels = json.loads(lj)
                name = labels.pop("__name__", "")
                for t, v in read_chunk(path, int(off)):
                    if min_ts is not None and t < min_ts:
                        continue
                    if max_ts is not None and t > max_ts:
                        continue
                    rows.append((name, labels, t, v))
            yield pd.DataFrame(
                rows, columns=["name", "labels", "ts", "value"]
            )

    out = ref_df.mapInPandas(
        decode, "name string, labels map<string,string>, ts long, value double"
    )
    return out.filter(~F.isnan("value"))


# ---------------------------------------------------------- block write
def write_tsdb_block(
    series: Iterable[tuple[dict[str, str], list[tuple[int, float]]]],
    out_dir: str,
    ulid: str = "01SPARKGRAFT0000000000TSDB",
    samples_per_chunk: int = 120,
) -> str:
    """Write a TSDB block (index v2 + XOR chunks + meta.json +
    tombstones) for the given series.  Emits the full symbol table,
    the sorted series section, the all-postings list and both offset
    tables — enough for any format-v2 reader.  Returns the block dir."""
    series = sorted(
        ((dict(lbls), sorted(pts)) for lbls, pts in series),
        key=lambda s: sorted(s[0].items()),
    )
    block_dir = os.path.join(out_dir, ulid)
    os.makedirs(os.path.join(block_dir, "chunks"), exist_ok=True)

    # ---- chunks segment (single segment: test/export-sized blocks)
    seg = bytearray(struct.pack(">IB3x", CHUNKS_MAGIC, 1))
    chunk_refs: list[list[tuple[int, int, int]]] = []  # per series
    nsamples = nchunks = 0
    mint_all, maxt_all = math.inf, -math.inf
    for lbls, pts in series:
        refs = []
        for i in range(0, len(pts), samples_per_chunk):
            part = pts[i : i + samples_per_chunk]
            data = encode_xor_chunk(part)
            off = len(seg)
            body = bytes([XOR_ENCODING]) + data
            seg += _put_uvarint(len(data)) + body
            seg += struct.pack(">I", crc32c(body))
            refs.append((off, part[0][0], part[-1][0]))
            nchunks += 1
            nsamples += len(part)
            mint_all = min(mint_all, part[0][0])
            maxt_all = max(maxt_all, part[-1][0])
        chunk_refs.append(refs)
    with open(os.path.join(block_dir, "chunks", "000001"), "wb") as f:
        f.write(seg)

    # ---- index
    idx = bytearray(struct.pack(">IB", INDEX_MAGIC, 2))
    # symbol table (sorted, includes "" for the all-postings key)
    syms = {""}
    for lbls, _ in series:
        for k, v in lbls.items():
            syms.add(k)
            syms.add(v)
    symbols = sorted(syms)
    sym_ref = {s: i for i, s in enumerate(symbols)}
    toc_symbols = len(idx)
    body = struct.pack(">I", len(symbols))
    for s in symbols:
        b = s.encode("utf-8")
        body += _put_uvarint(len(b)) + b
    idx += struct.pack(">I", len(body)) + body + struct.pack(
        ">I", crc32c(body)
    )
    # series section: 16-aligned entries, id = offset/16
    while len(idx) % 16:
        idx.append(0)
    toc_series = len(idx)
    series_ids = []
    for (lbls, _pts), refs in zip(series, chunk_refs):
        while len(idx) % 16:
            idx.append(0)
        series_ids.append(len(idx) // 16)
        content = _put_uvarint(len(lbls))
        for k in sorted(lbls):
            content += _put_uvarint(sym_ref[k]) + _put_uvarint(
                sym_ref[lbls[k]]
            )
        content += _put_uvarint(len(refs))
        prev_maxt = prev_ref = 0
        for ci, (off, mint, maxt) in enumerate(refs):
            ref = off  # segment 0 << 32 | offset
            if ci == 0:
                content += (
                    _put_varint(mint)
                    + _put_uvarint(maxt - mint)
                    + _put_uvarint(ref)
                )
            else:
                content += (
                    _put_varint(mint - prev_maxt)
                    + _put_uvarint(maxt - mint)
                    + _put_varint(ref - prev_ref)
                )
            prev_maxt, prev_ref = maxt, ref
        idx += _put_uvarint(len(content)) + content + struct.pack(
            ">I", crc32c(content)
        )
    # label indices: none (readers use postings; offset table below is
    # authoritative and empty)
    toc_label_indices = len(idx)
    # postings: the all-postings list (key "", "")
    toc_postings = len(idx)
    pbody = struct.pack(">I", len(series_ids)) + b"".join(
        struct.pack(">I", sid) for sid in series_ids
    )
    idx += struct.pack(">I", len(pbody)) + pbody + struct.pack(
        ">I", crc32c(pbody)
    )
    # label offset table: empty
    toc_label_offset = len(idx)
    lbody = struct.pack(">I", 0)
    idx += struct.pack(">I", len(lbody)) + lbody + struct.pack(
        ">I", crc32c(lbody)
    )
    # postings offset table: one entry -> all-postings
    toc_postings_offset = len(idx)
    entry = (
        _put_uvarint(2)
        + _put_uvarint(0)
        + _put_uvarint(0)
        + _put_uvarint(toc_postings)
    )
    obody = struct.pack(">I", 1) + entry
    idx += struct.pack(">I", len(obody)) + obody + struct.pack(
        ">I", crc32c(obody)
    )
    # TOC
    toc = struct.pack(
        ">6Q",
        toc_symbols,
        toc_series,
        toc_label_indices,
        toc_label_offset,
        toc_postings,
        toc_postings_offset,
    )
    idx += toc + struct.pack(">I", crc32c(toc))
    with open(os.path.join(block_dir, "index"), "wb") as f:
        f.write(idx)

    # ---- tombstones (empty) + meta.json
    tomb = struct.pack(">IB", TOMBSTONES_MAGIC, 1)
    with open(os.path.join(block_dir, "tombstones"), "wb") as f:
        f.write(tomb + struct.pack(">I", crc32c(b"")))
    meta = {
        "ulid": ulid,
        "minTime": int(mint_all) if series else 0,
        "maxTime": int(maxt_all) + 1 if series else 0,
        "stats": {
            "numSamples": nsamples,
            "numSeries": len(series),
            "numChunks": nchunks,
        },
        "compaction": {"level": 1, "sources": [ulid]},
        "version": 1,
    }
    with open(os.path.join(block_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return block_dir


# ------------------------------------------------------- snapshot dir
def list_blocks(
    snapshot_dir: str,
    min_ts: int | None = None,
    max_ts: int | None = None,
) -> list[str]:
    """Enumerate block dirs in a Prometheus snapshot/data directory,
    pruned by meta.json time range — vmctl's Explore block filter
    (app/vmctl/prometheus/prometheus.go:78-112, filter.inRange: a
    block survives when [minTime, maxTime] overlaps the filter)."""
    out = []
    for name in sorted(os.listdir(snapshot_dir)):
        bd = os.path.join(snapshot_dir, name)
        if not os.path.isfile(os.path.join(bd, "meta.json")):
            continue
        meta = read_meta(bd)
        lo, hi = meta.get("minTime", 0), meta.get("maxTime", 0)
        if min_ts is not None and hi < min_ts:
            continue
        if max_ts is not None and lo > max_ts:
            continue
        out.append(bd)
    return out


def snapshot_samples_df(
    spark,
    snapshot_dir: str,
    min_ts: int | None = None,
    max_ts: int | None = None,
    label: str | None = None,
    label_value: str | None = None,
):
    """Distributed read of a whole Prometheus snapshot directory — the
    vmctl prometheus migration in one call.  Three pruning levels, each
    BEFORE the next (cheaper) stage touches data: block meta.json time
    range -> per-chunk [mint, maxt] from the index -> per-sample.  The
    optional (label, label_value) filter (vmctl --prom-filter-label)
    drops whole series at the index stage, driver-side, so filtered-out
    series cost zero chunk reads."""
    blocks = list_blocks(snapshot_dir, min_ts, max_ts)
    df = block_samples_df_filtered(
        spark, blocks, min_ts, max_ts, label, label_value
    )
    return df


def block_samples_df_filtered(
    spark,
    block_dirs,
    min_ts=None,
    max_ts=None,
    label=None,
    label_value=None,
):
    """block_samples_df with an optional exact-match series label
    filter applied on the index-derived refs (pre-chunk-read)."""
    if label is None:
        return block_samples_df(spark, block_dirs, min_ts, max_ts)
    import pandas as pd
    from pyspark.sql import functions as F

    if isinstance(block_dirs, str):
        block_dirs = [block_dirs]
    refs = []
    for bd in block_dirs:
        for labels, chunks in read_block_index(bd):
            if labels.get(label) != label_value:
                continue
            lj = json.dumps(labels, sort_keys=True)
            for seg, off, mint, maxt in chunks:
                if min_ts is not None and maxt < min_ts:
                    continue
                if max_ts is not None and mint > max_ts:
                    continue
                refs.append(
                    (lj, os.path.join(bd, "chunks", f"{seg + 1:06d}"), off)
                )
    ref_df = spark.createDataFrame(
        refs, "labels_json string, path string, offset long"
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for lj, path, off in zip(
                pdf["labels_json"], pdf["path"], pdf["offset"]
            ):
                labels = json.loads(lj)
                name = labels.pop("__name__", "")
                for t, v in read_chunk(path, int(off)):
                    if min_ts is not None and t < min_ts:
                        continue
                    if max_ts is not None and t > max_ts:
                        continue
                    rows.append((name, labels, t, v))
            yield pd.DataFrame(
                rows, columns=["name", "labels", "ts", "value"]
            )

    out = ref_df.mapInPandas(
        decode, "name string, labels map<string,string>, ts long, value double"
    )
    return out.filter(~F.isnan("value"))
