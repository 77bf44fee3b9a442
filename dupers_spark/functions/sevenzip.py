"""Minimal 7z reader/writer on stdlib ``lzma`` — closes the last sliver of
dupers' `up+` archive support (S4): the reference reads 7z members via a
dedicated reader (pkg/dupe/dupe.go:648-693 read7Zip; format table
pkg/dupe/internal/archive/archive.go:42-68). This container ships no py7zr
and no 7z binary, so this module implements the subset of the public 7z
container format (7zFormat.txt, LZMA SDK) needed to hash members:

  reader: plain AND encoded (kEncodedHeader — modern 7-Zip's default)
          headers; folders whose coders form a LINEAR chain of Copy
          (store), LZMA2, LZMA1, Delta, or BCJ branch filters (x86 / ARM /
          ARMT / PPC / SPARC / IA64); BCJ2 multi-stream folders (the
          4-input x86 branch converter with its own range decoder —
          general bind-pair DAG evaluation, explicit packed-stream
          indices); multiple folders; substream splitting; empty
          files/streams. Still outside the subset — external streams,
          alternative-method coders, unknown coder ids — raises
          ``Unsupported7z``; the archive operator surfaces that as an
          accounted error row, never a silent skip.
  writer: one folder per member, Copy or LZMA2 or BCJ2+LZMA2, plain or
          encoded header (for round-trip tests and for emitting
          interchange archives without external tools).

Everything here is pure CPU over in-memory bytes — it runs inside the same
Arrow-batched mapInPandas explode as the zip/tar readers (operators/
archive.py), one archive per row, embarrassingly parallel.
"""

from __future__ import annotations

import lzma
import struct

SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
K_END = 0x00
K_HEADER = 0x01
K_MAIN_STREAMS = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS_INFO = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_EMPTY_STREAM = 0x0E
K_EMPTY_FILE = 0x0F
K_NAME = 0x11
K_ENCODED_HEADER = 0x17

CODER_COPY = b"\x00"
CODER_LZMA2 = b"\x21"
CODER_LZMA1 = b"\x03\x01\x01"


class Unsupported7z(ValueError):
    """Valid 7z container using a feature outside the supported subset."""


class Bad7z(ValueError):
    """Not a (well-formed) 7z container."""


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def bytes_(self, n: int) -> bytes:
        out = self.data[self.pos: self.pos + n]
        if len(out) != n:
            raise Bad7z("truncated 7z header")
        self.pos += n
        return out

    def number(self) -> int:
        """7z variable-length number (7zFormat.txt ReadNumber)."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if (first & mask) == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bits(self, n: int) -> list[bool]:
        out = []
        b = 0
        avail = 0
        for _ in range(n):
            if avail == 0:
                b = self.byte()
                avail = 8
            out.append(bool(b & 0x80))
            b = (b << 1) & 0xFF
            avail -= 1
        return out

    def bits_or_all(self, n: int) -> list[bool]:
        """BitVector preceded by allAreDefined byte."""
        if self.byte():
            return [True] * n
        return self.bits(n)


# ---------------------------------------------------------------- BCJ2
# BCJ2 (coder id 0303011B) is 7-Zip's 4-stream x86 branch converter: the
# encoder splits input into MAIN (code bytes with branch operands removed),
# CALL (absolute E8 targets, big-endian), JUMP (absolute E9/jcc targets) and
# RC (a binary range-coded bitstream recording which branch bytes were
# converted). Public algorithm: LZMA SDK Bcj2Dec.c / p7zip x86_2.cpp —
# probability context = previous byte for E8 (0..255), 256 for E9, 257 for
# 0F 8x jcc; 11-bit adaptive probabilities, 5-bit move, LZMA-style range
# coder. The encoder here exists for fixtures/interchange; any
# convert/don't-convert policy is valid because every decision is recorded
# in RC.

CODER_BCJ2 = b"\x03\x03\x01\x1b"
_RC_TOP = 1 << 24
_RC_MODEL_TOTAL = 1 << 11
_RC_MOVE_BITS = 5


class _RangeDecoder:
    """LZMA-style binary range decoder (Bcj2Dec.c semantics)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.range_ = 0xFFFFFFFF
        self.code = 0
        for _ in range(5):  # first byte is the encoder's zero cache byte
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF

    def _byte(self) -> int:
        if self.pos >= len(self.data):
            raise Bad7z("BCJ2 control stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def decode_bit(self, probs: list[int], i: int) -> int:
        bound = (self.range_ >> 11) * probs[i]
        if self.code < bound:
            self.range_ = bound
            probs[i] += (_RC_MODEL_TOTAL - probs[i]) >> _RC_MOVE_BITS
            bit = 0
        else:
            self.range_ -= bound
            self.code -= bound
            probs[i] -= probs[i] >> _RC_MOVE_BITS
            bit = 1
        if self.range_ < _RC_TOP:
            self.range_ = (self.range_ << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF
        return bit


class _RangeEncoder:
    """Matching binary range encoder (carry-propagating ShiftLow)."""

    def __init__(self) -> None:
        self.low = 0
        self.range_ = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def encode_bit(self, probs: list[int], i: int, bit: int) -> None:
        bound = (self.range_ >> 11) * probs[i]
        if bit == 0:
            self.range_ = bound
            probs[i] += (_RC_MODEL_TOTAL - probs[i]) >> _RC_MOVE_BITS
        else:
            self.low += bound
            self.range_ -= bound
            probs[i] -= probs[i] >> _RC_MOVE_BITS
        while self.range_ < _RC_TOP:
            self._shift_low()
            self.range_ = (self.range_ << 8) & 0xFFFFFFFF

    def _shift_low(self) -> None:
        if (self.low & 0xFFFFFFFF) < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            while self.cache_size > 1:
                self.out.append((0xFF + carry) & 0xFF)
                self.cache_size -= 1
            self.cache = (self.low >> 24) & 0xFF
            self.cache_size = 0
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


def _is_branch(prev: int, b: int) -> bool:
    return (b & 0xFE) == 0xE8 or (prev == 0x0F and (b & 0xF0) == 0x80)


def _bcj2_ctx(prev: int, b: int) -> int:
    return prev if b == 0xE8 else (256 if b == 0xE9 else 257)


def bcj2_decode(main: bytes, call: bytes, jump: bytes, rc: bytes,
                out_size: int) -> bytes:
    """Reassemble the original byte stream from BCJ2's four streams."""
    out = bytearray()
    rd = _RangeDecoder(rc)
    probs = [_RC_MODEL_TOTAL >> 1] * (2 + 256)
    mp = cp = jp = 0
    prev = 0
    while len(out) < out_size:
        if mp >= len(main):
            raise Bad7z("BCJ2 main stream exhausted")
        b = main[mp]
        mp += 1
        out.append(b)
        if not _is_branch(prev, b):
            prev = b
            continue
        if rd.decode_bit(probs, _bcj2_ctx(prev, b)):
            if b == 0xE8:
                src_bytes, cp = call[cp:cp + 4], cp + 4
            else:
                src_bytes, jp = jump[jp:jp + 4], jp + 4
            if len(src_bytes) != 4 or len(out) + 4 > out_size:
                raise Bad7z("BCJ2 target stream exhausted")
            src = int.from_bytes(src_bytes, "big")
            dest = (src - (len(out) + 4)) & 0xFFFFFFFF
            out += dest.to_bytes(4, "little")
            prev = dest >> 24
        else:
            prev = b
    return bytes(out)


def bcj2_encode(data: bytes) -> tuple[bytes, bytes, bytes, bytes]:
    """→ (main, call, jump, rc). Converts every branch whose 4 operand
    bytes are in-bounds; the decision bits make any policy decodable."""
    main, call, jump = bytearray(), bytearray(), bytearray()
    re_ = _RangeEncoder()
    probs = [_RC_MODEL_TOTAL >> 1] * (2 + 256)
    pos = 0
    prev = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        main.append(b)
        if not _is_branch(prev, b):
            prev = b
            pos += 1
            continue
        convert = pos + 5 <= n
        re_.encode_bit(probs, _bcj2_ctx(prev, b), 1 if convert else 0)
        if convert:
            rel = int.from_bytes(data[pos + 1:pos + 5], "little")
            src = (rel + pos + 5) & 0xFFFFFFFF
            (call if b == 0xE8 else jump).extend(src.to_bytes(4, "big"))
            prev = data[pos + 4]  # == top byte of the relative offset
            pos += 5
        else:
            prev = b
            pos += 1
    return bytes(main), bytes(call), bytes(jump), re_.flush()


# branch (BCJ) and delta filter coder ids → stdlib lzma filter ids; these
# decode as raw filter CHAINS ([branch/delta, lzma] in compression order)
CODER_DELTA = b"\x03"
_BRANCH_CODERS = {
    b"\x03\x03\x01\x03": lzma.FILTER_X86,
    b"\x03\x03\x02\x05": lzma.FILTER_POWERPC,
    b"\x03\x03\x04\x01": lzma.FILTER_IA64,
    b"\x03\x03\x05\x01": lzma.FILTER_ARM,
    b"\x03\x03\x07\x01": lzma.FILTER_ARMTHUMB,
    b"\x03\x03\x08\x05": lzma.FILTER_SPARC,
}


def _filter_spec(coder_id: bytes, props: bytes) -> dict:
    """Map a 7z coder id + its properties to a stdlib lzma raw-filter dict."""
    if coder_id == CODER_LZMA2:
        return lzma._decode_filter_properties(lzma.FILTER_LZMA2, props)
    if coder_id == CODER_LZMA1:
        return lzma._decode_filter_properties(lzma.FILTER_LZMA1, props)
    if coder_id == CODER_DELTA:
        return {"id": lzma.FILTER_DELTA,
                "dist": (props[0] + 1) if props else 1}
    if coder_id in _BRANCH_CODERS:
        fid = _BRANCH_CODERS[coder_id]
        if props:
            return lzma._decode_filter_properties(fid, props)
        return {"id": fid}
    raise Unsupported7z(f"7z coder {coder_id.hex()} unsupported "
                        "(supported: copy, lzma, lzma2, delta, BCJ branches)")


def _folder_chain(folder: dict) -> list[int]:
    """Coder indices in decode order (packed stream first → final output).

    For folders of simple (1-in/1-out) coders only — there the bind pairs
    form a path: in-stream i of coder i consumes the out-stream of exactly
    one earlier/later coder, and exactly one out-stream is unbound (the
    folder's output). Multi-input folders (BCJ2) take the DAG path in
    _decode_folder_dag instead.
    """
    binds = folder["binds"]
    n = len(folder["coders"])
    consumed_out = {o for _i, o in binds}
    finals = [j for j in range(n) if j not in consumed_out]
    if len(finals) != 1:
        raise Bad7z("7z folder is not a single-output chain")
    in_to_src = dict(binds)  # in-stream index (== coder index) → source out
    order = []
    cur = finals[0]
    for _ in range(n):
        order.append(cur)
        if cur not in in_to_src:
            break
        cur = in_to_src[cur]
    else:
        raise Bad7z("7z folder bind pairs contain a cycle")
    if len(order) != n:
        raise Bad7z("7z folder bind pairs do not form one chain")
    return list(reversed(order))


def _decode_folder(folder: dict, packs: list[bytes]) -> bytes:
    """Decode one folder's packed stream(s) through its coder graph."""
    coders_all = folder["coders"]
    if any(c["n_in"] != 1 or c["n_out"] != 1 for c in coders_all):
        return _decode_folder_dag(folder, packs)
    if len(packs) != 1:
        raise Bad7z("linear 7z folder with multiple pack streams")
    packed = packs[0]
    order = _folder_chain(folder)
    coders = [coders_all[i] for i in order]
    unpack_size = folder["out_sizes"][order[-1]]
    # Copy coders are identity transforms wherever they sit in the chain —
    # drop them (a bare Copy folder returns the packed bytes directly).
    # A Copy whose declared out_size is SMALLER than its input is a
    # truncation, which the DAG evaluator honors (ins[0][:out_size]) but a
    # dropped coder would not — route such (pathological) folders through
    # the general path instead of silently decoding differently.
    for j, c in enumerate(coders):
        if c["id"] != CODER_COPY:
            continue
        in_size = (len(packed) if j == 0
                   else folder["out_sizes"][order[j - 1]])
        if folder["out_sizes"][order[j]] != in_size:
            return _decode_folder_dag(folder, packs)
    coders = [c for c in coders if c["id"] != CODER_COPY]
    if not coders:
        return packed[:unpack_size]
    # lzma raw filters are listed in COMPRESSION order — the reverse of the
    # decode walk (packed → lzma → branch/delta → output)
    filters = [_filter_spec(c["id"], c["props"]) for c in reversed(coders)]
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filters)
    return dec.decompress(packed, max_length=unpack_size)


def _decode_folder_dag(folder: dict, packs: list[bytes]) -> bytes:
    """General folder evaluation for multi-input coders (BCJ2): each
    coder's inputs come from a packed stream or another coder's output per
    the bind pairs; outputs are memoized, the unbound out-stream is the
    folder result. Per-coder decode here (no lzma chain fusion): Copy /
    LZMA1 / LZMA2 / Delta / BCJ2."""
    coders = folder["coders"]
    in_off, out_off, ti, to = [], [], 0, 0
    for c in coders:
        in_off.append(ti)
        out_off.append(to)
        ti += c["n_in"]
        to += c["n_out"]
    out_to_coder = {}
    for ci, c in enumerate(coders):
        if c["n_out"] != 1:
            raise Unsupported7z("7z coder with multiple outputs unsupported")
        out_to_coder[out_off[ci]] = ci
    bind_by_in = dict(folder["binds"])
    packed_pos = {gin: k for k, gin in enumerate(folder["packed"])}
    memo: dict[int, bytes] = {}

    def produce(ci: int) -> bytes:
        if ci in memo:
            return memo[ci]
        c = coders[ci]
        ins: list[bytes] = []
        for local in range(c["n_in"]):
            gin = in_off[ci] + local
            if gin in bind_by_in:
                ins.append(produce(out_to_coder[bind_by_in[gin]]))
            elif gin in packed_pos:
                ins.append(packs[packed_pos[gin]])
            else:
                raise Bad7z("7z folder in-stream neither bound nor packed")
        out_size = folder["out_sizes"][out_off[ci]]
        cid = c["id"]
        if cid == CODER_BCJ2:
            if len(ins) != 4:
                raise Bad7z("BCJ2 coder requires 4 input streams")
            res = bcj2_decode(ins[0], ins[1], ins[2], ins[3], out_size)
        elif cid == CODER_COPY:
            res = ins[0][:out_size]
        elif cid in (CODER_LZMA1, CODER_LZMA2):
            dec = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[_filter_spec(cid, c["props"])])
            res = dec.decompress(ins[0], max_length=out_size)
        elif cid == CODER_DELTA:
            dist = (c["props"][0] + 1) if c["props"] else 1
            buf = bytearray(ins[0][:out_size])
            for k in range(dist, len(buf)):
                buf[k] = (buf[k] + buf[k - dist]) & 0xFF
            res = bytes(buf)
        else:
            raise Unsupported7z(
                f"7z coder {cid.hex()} unsupported inside a "
                "multi-stream folder")
        if len(res) != out_size:
            raise Bad7z("7z coder decoded to wrong size")
        memo[ci] = res
        return res

    return produce(out_to_coder[folder["final_out"]])


def _read_streams_info(r: _Reader) -> dict:
    """Parse a StreamsInfo block: PackInfo + UnpackInfo + SubStreamsInfo.

    Shared by kMainStreamsInfo and the kEncodedHeader stream description —
    the encoded header is just one more folder whose output happens to be
    the real header. Consumes up to and including the block's kEnd."""
    pack_sizes: list[int] = []
    pack_pos = 0
    folders: list[dict] = []
    num_unpack_streams: list[int] = []
    substream_sizes: list[int] | None = None

    tid = r.number()
    if tid == K_PACK_INFO:
        pack_pos = r.number()
        n_pack = r.number()
        while True:
            t = r.number()
            if t == K_END:
                break
            if t == K_SIZE:
                pack_sizes = [r.number() for _ in range(n_pack)]
            elif t == K_CRC:
                defined = r.bits_or_all(n_pack)
                r.bytes_(4 * sum(defined))
            else:
                raise Bad7z(f"unexpected id {t:#x} in PackInfo")
        tid = r.number()
    if tid == K_UNPACK_INFO:
        if r.number() != K_FOLDER:
            raise Bad7z("UnpackInfo without kFolder")
        n_folders = r.number()
        if r.byte() != 0:
            raise Unsupported7z("external folder definitions unsupported")
        for _ in range(n_folders):
            n_coders = r.number()
            coders = []
            for _ in range(n_coders):
                flags = r.byte()
                if flags & 0xC0:
                    raise Unsupported7z(
                        "7z alternative-method coders unsupported")
                cid = r.bytes_(flags & 0x0F)
                n_in = n_out = 1
                if flags & 0x10:  # complex coder: >1 in/out streams (BCJ2)
                    n_in = r.number()
                    n_out = r.number()
                props = r.bytes_(r.number()) if flags & 0x20 else b""
                coders.append({"id": cid, "props": props,
                               "n_in": n_in, "n_out": n_out})
            total_in = sum(c["n_in"] for c in coders)
            total_out = sum(c["n_out"] for c in coders)
            binds = [(r.number(), r.number()) for _ in range(total_out - 1)]
            n_packed = total_in - len(binds)
            if n_packed < 1:
                raise Bad7z("7z folder without a packed stream")
            if n_packed == 1:
                bound_ins = {i for i, _o in binds}
                packed = [i for i in range(total_in) if i not in bound_ins]
                if len(packed) != 1:
                    raise Bad7z("7z folder bind pairs over-consume inputs")
            else:  # pack-stream order is explicit (BCJ2 folders)
                packed = [r.number() for _ in range(n_packed)]
            consumed = {o for _i, o in binds}
            finals = [o for o in range(total_out) if o not in consumed]
            if len(finals) != 1:
                raise Bad7z("7z folder is not single-output")
            folders.append({"coders": coders, "binds": binds,
                            "packed": packed, "final_out": finals[0]})
        if r.number() != K_CODERS_UNPACK_SIZE:
            raise Bad7z("missing kCodersUnpackSize")
        for f in folders:
            # one size per OUT STREAM (not per coder — BCJ2 folders differ)
            f["out_sizes"] = [r.number() for _ in range(
                sum(c["n_out"] for c in f["coders"]))]
            f["unpack_size"] = f["out_sizes"][f["final_out"]]
        while True:
            t = r.number()
            if t == K_END:
                break
            if t == K_CRC:
                defined = r.bits_or_all(len(folders))
                r.bytes_(4 * sum(defined))
                # remember which folders carry a known CRC: SubStreamsInfo
                # kCRC stores digests ONLY for streams whose CRC is still
                # unknown, and a single-substream folder with a defined
                # folder CRC is excluded from that count (7zFormat.txt)
                for f, d in zip(folders, defined):
                    f["crc_defined"] = bool(d)
            else:
                raise Bad7z(f"unexpected id {t:#x} in UnpackInfo")
        tid = r.number()
    if tid == K_SUBSTREAMS_INFO:
        t = r.number()
        if t == K_NUM_UNPACK_STREAM:
            num_unpack_streams = [r.number() for _ in folders]
            t = r.number()
        else:
            num_unpack_streams = [1] * len(folders)
        if t == K_SIZE:
            # sizes for all but the LAST substream of each folder
            substream_sizes = []
            for f, cnt in zip(folders, num_unpack_streams):
                given = [r.number() for _ in range(cnt - 1)]
                substream_sizes.extend(given + [f["unpack_size"] - sum(given)])
            t = r.number()
        if t == K_CRC:
            # digests only for streams with UNKNOWN CRC: folders with one
            # substream whose CRC was already defined in UnpackInfo kCRC
            # contribute zero entries here (7zFormat.txt SubStreamsInfo)
            unknown = sum(
                0 if (cnt == 1 and f.get("crc_defined")) else cnt
                for f, cnt in zip(folders, num_unpack_streams))
            defined = r.bits_or_all(unknown)
            r.bytes_(4 * sum(defined))
            t = r.number()
        if t != K_END:
            raise Bad7z(f"unexpected id {t:#x} in SubStreamsInfo")
        tid = r.number()
    if tid != K_END:
        raise Bad7z(f"unexpected id {tid:#x} in StreamsInfo")
    if not num_unpack_streams:
        num_unpack_streams = [1] * len(folders)
    if substream_sizes is None:
        substream_sizes = [f["unpack_size"] for f in folders]
    return {
        "pack_pos": pack_pos,
        "pack_sizes": pack_sizes,
        "folders": folders,
        "num_unpack_streams": num_unpack_streams,
        "substream_sizes": substream_sizes,
    }


def _decode_payloads(data: bytes, si: dict) -> list[bytes]:
    """Decode every folder's packed stream(s) → unpacked payload per folder.

    Pack streams are assigned to folders in order: each folder consumes
    len(folder["packed"]) consecutive streams (one for linear chains, four
    for a typical BCJ2 folder)."""
    expected = sum(len(f["packed"]) for f in si["folders"])
    if len(si["pack_sizes"]) != expected:
        raise Bad7z("7z pack-stream/folder count mismatch")
    blobs: list[bytes] = []
    off = 32 + si["pack_pos"]
    for psize in si["pack_sizes"]:
        blob = data[off: off + psize]
        if len(blob) != psize:
            raise Bad7z("truncated 7z pack stream")
        blobs.append(blob)
        off += psize
    payloads: list[bytes] = []
    k = 0
    for f in si["folders"]:
        cnt = len(f["packed"])
        out = _decode_folder(f, blobs[k:k + cnt])
        k += cnt
        if len(out) != f["unpack_size"]:
            raise Bad7z("7z folder decoded to wrong size")
        payloads.append(out)
    return payloads


def read_7z(data: bytes) -> list[tuple[str, bytes]]:
    """→ [(member_name, member_bytes)] in archive order.

    Reads plain AND encoded (kEncodedHeader — modern 7-Zip's default,
    where the header itself is an LZMA-compressed stream) headers, and
    folders whose coders form a linear chain of Copy / LZMA1 / LZMA2 /
    Delta / BCJ-branch filters. Raises Bad7z on malformed input,
    Unsupported7z on valid-but-exotic archives (BCJ2 multi-input coders,
    external streams, unknown coder ids).
    """
    if data[:6] != SIGNATURE:
        raise Bad7z("missing 7z signature")
    if len(data) < 32:
        raise Bad7z("truncated 7z")
    next_off, next_size = struct.unpack("<QQ", data[12:28])
    hdr_start = 32 + next_off
    header = data[hdr_start: hdr_start + next_size]
    if len(header) != next_size:
        raise Bad7z("truncated 7z end header")
    if not header:
        return []
    r = _Reader(header)
    try:
        tid = r.number()
        if tid == K_ENCODED_HEADER:
            # the remainder is a StreamsInfo describing how the REAL header
            # was packed — decode it through the same folder machinery,
            # then restart the parse on the decoded bytes
            hdr_si = _read_streams_info(r)
            header = b"".join(_decode_payloads(data, hdr_si))
            r = _Reader(header)
            tid = r.number()
        if tid != K_HEADER:
            raise Bad7z(f"unexpected 7z header id {tid:#x}")

        si = {"pack_pos": 0, "pack_sizes": [], "folders": [],
              "num_unpack_streams": [], "substream_sizes": []}
        tid = r.number()
        if tid == K_MAIN_STREAMS:
            si = _read_streams_info(r)
            tid = r.number()
    except IndexError as exc:  # _Reader ran off the end of the header
        raise Bad7z("truncated 7z header") from exc
    folders = si["folders"]
    num_unpack_streams = si["num_unpack_streams"]
    substream_sizes = si["substream_sizes"]

    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    n_files = 0
    if tid == K_FILES_INFO:
        n_files = r.number()
        empty_stream = [False] * n_files
        while True:
            t = r.number()
            if t == K_END:
                break
            size = r.number()
            end = r.pos + size
            if t == K_EMPTY_STREAM:
                empty_stream = r.bits(n_files)
            elif t == K_EMPTY_FILE:
                empty_file = r.bits(sum(empty_stream))
            elif t == K_NAME:
                if r.byte() != 0:
                    raise Unsupported7z("external 7z names unsupported")
                raw = r.bytes_(end - r.pos)
                names = raw.decode("utf-16-le").split("\x00")[:-1]
            r.pos = end
        tid = r.number()
    if tid != K_END:
        raise Bad7z(f"unexpected trailing id {tid:#x} in header")
    if names and len(names) != n_files:
        raise Bad7z("7z name count mismatch")

    # decode folders → concatenated unpacked payload per folder
    payloads = _decode_payloads(data, si)

    # split folder payloads into substreams, assign to non-empty files
    streams: list[bytes] = []
    si = 0
    for fi, cnt in enumerate(num_unpack_streams):
        pos = 0
        for _ in range(cnt):
            sz = substream_sizes[si]
            streams.append(payloads[fi][pos: pos + sz])
            pos += sz
            si += 1

    members: list[tuple[str, bytes]] = []
    stream_it = iter(streams)
    empty_it = iter(empty_file or [])
    for i in range(n_files):
        name = names[i] if names else f"member_{i}"
        if empty_stream[i]:
            # empty stream: file content b'' if kEmptyFile bit set, else a
            # directory entry — skip directories like the zip/tar readers
            is_file = next(empty_it, False)
            if is_file:
                members.append((name, b""))
            continue
        members.append((name, next(stream_it)))
    return members


# --------------------------------------------------------------- writer

class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def byte(self, b: int) -> None:
        self.buf.append(b)

    def bytes_(self, b: bytes) -> None:
        self.buf.extend(b)

    def number(self, value: int) -> None:
        """Inverse of _Reader.number — shortest encoding.

        i extra little-endian low bytes + (7-i) high bits in the first
        byte behind i leading 1-bits; capacity at i bytes is 7i+7 bits.
        """
        for i in range(9):
            if i == 8:
                self.buf.append(0xFF)
                self.buf.extend(value.to_bytes(8, "little"))
                return
            if value < (1 << (7 * i + 7)):
                lead = (0xFF << (8 - i)) & 0xFF
                self.buf.append(lead | (value >> (8 * i)))
                self.buf.extend((value & ((1 << (8 * i)) - 1)).to_bytes(i, "little"))
                return


def write_7z(members: list[tuple[str, bytes]], compress: bool = False,
             encoded_header: bool = False, bcj2: bool = False) -> bytes:
    """Store-only (or LZMA2, or BCJ2+LZMA2) 7z: one folder per non-empty
    member.

    Subset writer for round-trip tests and tool-free interchange; readable
    by any conforming 7z implementation (explicit names, no CRCs).
    encoded_header=True LZMA2-compresses the header and points the start
    header at a kEncodedHeader stream description instead — the layout
    modern 7-Zip emits by default. bcj2=True emits the executable shape:
    each member runs through the BCJ2 branch converter, the main stream is
    LZMA2-compressed, call/jump/rc are stored — a 2-coder folder (BCJ2 +
    LZMA2) with one bind pair and four pack streams, the same folder graph
    7-Zip builds for x86 payloads.
    """
    packs: list[bytes] = []
    folders: list[dict] = []
    non_empty = [(n, b) for n, b in members if b]
    lz_spec = {"id": lzma.FILTER_LZMA2, "preset": 6}

    def lz(blob: bytes) -> tuple[bytes, bytes]:
        comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[lz_spec])
        return (comp.compress(blob) + comp.flush(),
                lzma._encode_filter_properties(lz_spec))

    for _name, blob in non_empty:
        if bcj2:
            main, call, jump, rc = bcj2_encode(blob)
            mpacked, props = lz(main)
            folders.append({
                # coder 0: BCJ2 (ins 0-3 = main/call/jump/rc, out 0)
                # coder 1: LZMA2 (in 4 = pack stream, out 1 → BCJ2 main)
                "coders": [(CODER_BCJ2, b"", 4, 1), (CODER_LZMA2, props, 1, 1)],
                "binds": [(0, 1)],
                "packed": [4, 1, 2, 3],
                "out_sizes": [len(blob), len(main)],
                "packs": [mpacked, call, jump, rc],
            })
        elif compress:
            packed, props = lz(blob)
            folders.append({"coders": [(CODER_LZMA2, props, 1, 1)],
                            "binds": [], "packed": [0],
                            "out_sizes": [len(blob)], "packs": [packed]})
        else:
            folders.append({"coders": [(CODER_COPY, b"", 1, 1)],
                            "binds": [], "packed": [0],
                            "out_sizes": [len(blob)], "packs": [blob]})
        packs.extend(folders[-1]["packs"])

    w = _Writer()
    w.number(K_HEADER)
    if folders:
        w.number(K_MAIN_STREAMS)
        w.number(K_PACK_INFO)
        w.number(0)                      # pack pos
        w.number(len(packs))
        w.number(K_SIZE)
        for p in packs:
            w.number(len(p))
        w.number(K_END)
        w.number(K_UNPACK_INFO)
        w.number(K_FOLDER)
        w.number(len(folders))
        w.byte(0)                        # not external
        for f in folders:
            w.number(len(f["coders"]))
            for cid, props, n_in, n_out in f["coders"]:
                complex_ = n_in != 1 or n_out != 1
                flags = len(cid) | (0x10 if complex_ else 0) \
                    | (0x20 if props else 0)
                w.byte(flags)
                w.bytes_(cid)
                if complex_:
                    w.number(n_in)
                    w.number(n_out)
                if props:
                    w.number(len(props))
                    w.bytes_(props)
            for i, o in f["binds"]:
                w.number(i)
                w.number(o)
            if len(f["packed"]) > 1:
                for idx in f["packed"]:
                    w.number(idx)
        w.number(K_CODERS_UNPACK_SIZE)
        for f in folders:
            for us in f["out_sizes"]:
                w.number(us)
        w.number(K_END)
        w.number(K_END)
    # FilesInfo: all members (empty ones flagged via kEmptyStream+kEmptyFile)
    w.number(K_FILES_INFO)
    w.number(len(members))
    empties = [not b for _n, b in members]
    if any(empties):
        bits = bytearray((len(members) + 7) // 8)
        for i, e in enumerate(empties):
            if e:
                bits[i // 8] |= 0x80 >> (i % 8)
        w.number(K_EMPTY_STREAM)
        w.number(len(bits))
        w.bytes_(bytes(bits))
        n_empty = sum(empties)
        fbits = bytearray((n_empty + 7) // 8)
        for i in range(n_empty):         # every empty stream is a FILE here
            fbits[i // 8] |= 0x80 >> (i % 8)
        w.number(K_EMPTY_FILE)
        w.number(len(fbits))
        w.bytes_(bytes(fbits))
    names_blob = bytearray([0])          # not external
    for n, _b in members:
        names_blob += n.encode("utf-16-le") + b"\x00\x00"
    w.number(K_NAME)
    w.number(len(names_blob))
    w.bytes_(bytes(names_blob))
    w.number(K_END)                      # end FilesInfo property loop
    w.number(K_END)                      # end Header

    header = bytes(w.buf)
    body = b"".join(packs)
    if encoded_header:
        spec = {"id": lzma.FILTER_LZMA2, "preset": 6}
        hprops = lzma._encode_filter_properties(spec)
        comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[spec])
        hpacked = comp.compress(header) + comp.flush()
        ew = _Writer()
        ew.number(K_ENCODED_HEADER)
        ew.number(K_PACK_INFO)
        ew.number(len(body))             # header pack stream sits after body
        ew.number(1)
        ew.number(K_SIZE)
        ew.number(len(hpacked))
        ew.number(K_END)
        ew.number(K_UNPACK_INFO)
        ew.number(K_FOLDER)
        ew.number(1)
        ew.byte(0)                       # not external
        ew.number(1)                     # one coder
        ew.byte(len(CODER_LZMA2) | 0x20)
        ew.bytes_(CODER_LZMA2)
        ew.number(len(hprops))
        ew.bytes_(hprops)
        ew.number(K_CODERS_UNPACK_SIZE)
        ew.number(len(header))
        ew.number(K_END)                 # end UnpackInfo property loop
        ew.number(K_END)                 # end StreamsInfo
        body += hpacked
        header = bytes(ew.buf)
    import zlib

    start_hdr = struct.pack("<QQI", len(body), len(header),
                            zlib.crc32(header))
    sig = SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(start_hdr))
    return sig + start_hdr + body + header
