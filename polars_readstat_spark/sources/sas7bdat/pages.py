"""SAS7BDAT page walking, row extraction, and decompression.

Row sources (public sas7bdat spec):
- DATA pages: `block_count` contiguous rows after the subheader
  pointer array
- MIX pages: rows follow the metadata subheaders (8-byte alignment
  quirk preserved exactly as the independent readers implement it)
- compressed files: each row is a data subheader on a meta page,
  RLE (SASYZCRL) or RDC (SASYZCR2) compressed

The RLE/RDC algorithms below are implemented from the publicly
documented control-byte tables (Shotwell's sas7bdat spec §5;
identical tables appear across the open-source readers).
Reference parity: src/sas/decompressor/{rle,rdc}.rs, src/sas/page.rs,
src/sas/data.rs — re-derived, not translated.
"""

from __future__ import annotations

from polars_readstat_spark.sources.sas7bdat.meta import (
    COMPRESSED_SUBHEADER_ID,
    COMPRESSED_SUBHEADER_TYPE,
    PAGE_DATA_TYPE,
    PAGE_META_TYPES,
    PAGE_MIX_TYPE,
    RDC,
    RLE,
    TRUNCATED_SUBHEADER_ID,
    SasMeta,
    _PageReader,
)


def rle_decompress(buf: bytes, result_length: int) -> bytes:
    """SASYZCRL run-length decompression (public control-byte table)."""
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n:
        ctrl = buf[i]
        cmd = ctrl >> 4
        ln = ctrl & 0x0F
        i += 1
        # truncated header/fill reads retire the stream with the
        # remainder zero-filled (the final pad below) — identical to
        # the wavefront's aliveness filter, so corrupt streams decode
        # the same bytes on both paths instead of raising IndexError
        if cmd == 0x0:  # copy64
            if i >= n:
                break
            cnt = (ln << 8) + buf[i] + 64
            i += 1
            out += buf[i : i + cnt]
            i += cnt
        elif cmd == 0x4:  # insert byte, long
            if i + 1 >= n:
                break
            cnt = (ln << 8) + buf[i] + 18
            i += 1
            out += bytes([buf[i]]) * cnt
            i += 1
        elif cmd == 0x5:  # insert @, long
            if i >= n:
                break
            cnt = (ln << 8) + buf[i] + 17
            i += 1
            out += b"@" * cnt
        elif cmd == 0x6:  # insert blank, long
            if i >= n:
                break
            cnt = (ln << 8) + buf[i] + 17
            i += 1
            out += b" " * cnt
        elif cmd == 0x7:  # insert zero, long
            if i >= n:
                break
            cnt = (ln << 8) + buf[i] + 17
            i += 1
            out += b"\x00" * cnt
        elif cmd == 0x8:
            cnt = ln + 1
            out += buf[i : i + cnt]
            i += cnt
        elif cmd == 0x9:
            cnt = ln + 17
            out += buf[i : i + cnt]
            i += cnt
        elif cmd == 0xA:
            cnt = ln + 33
            out += buf[i : i + cnt]
            i += cnt
        elif cmd == 0xB:
            cnt = ln + 49
            out += buf[i : i + cnt]
            i += cnt
        elif cmd == 0xC:  # insert byte, short
            if i >= n:
                break
            out += bytes([buf[i]]) * (ln + 3)
            i += 1
        elif cmd == 0xD:
            out += b"@" * (ln + 2)
        elif cmd == 0xE:
            out += b" " * (ln + 2)
        elif cmd == 0xF:
            out += b"\x00" * (ln + 2)
        else:  # 0x1-0x3: not emitted by SAS
            raise ValueError(f"unknown RLE command {cmd:#x}")
    if len(out) != result_length:
        # pad/truncate defensively (some writers round row storage)
        if len(out) < result_length:
            out += b"\x00" * (result_length - len(out))
        else:
            out = out[:result_length]
    return bytes(out)


def rle_decompress_rows(
    page: bytes, spans: list[tuple[int, int]], row_length: int
):
    """Batch SASYZCRL decompression of many independent row streams.

    The RLE control walk is serial *within* a row but rows are
    independent, so the loop runs as a wavefront: each iteration
    executes ONE control op for EVERY still-active row with numpy
    gathers/scatters (the per-op Python cost amortizes over the
    page's rows — ~2000 on a 64 KiB page — instead of being paid per
    row). Returns a (len(spans), row_length) uint8 matrix; output is
    zero-initialized so the 0x7/0xF zero-fill ops and the defensive
    short-stream padding need no writes at all. Raises on control
    commands 0x1-0x3 exactly like the scalar rle_decompress.
    """
    import numpy as np

    buf = np.frombuffer(page, dtype=np.uint8)
    nb_total = len(buf)
    r = len(spans)
    out = np.zeros(r * row_length, dtype=np.uint8)
    ip = np.fromiter((s for s, _ in spans), dtype=np.int64, count=r)
    iend = ip + np.fromiter((l for _, l in spans), dtype=np.int64, count=r)
    op = np.arange(r, dtype=np.int64) * row_length  # absolute out cursor
    oend = op + row_length

    def scatter_copy(dst, src, cnt):
        tot = int(cnt.sum())
        if not tot:
            return
        cs = np.cumsum(cnt)
        idx = np.arange(tot, dtype=np.int64) - np.repeat(cs - cnt, cnt)
        out[np.repeat(dst, cnt) + idx] = buf[np.repeat(src, cnt) + idx]

    def scatter_fill(dst, val, cnt):
        tot = int(cnt.sum())
        if not tot:
            return
        cs = np.cumsum(cnt)
        idx = np.arange(tot, dtype=np.int64) - np.repeat(cs - cnt, cnt)
        out[np.repeat(dst, cnt) + idx] = np.repeat(val, cnt)

    # per-command lookup tables (one gather each replaces a chain of
    # np.where temporaries — the wavefront's bookkeeping cost is what
    # decides whether it beats the scalar loop)
    #   ADD: additive count constant; LONG: second count byte present;
    #   KIND: 0 copy, 1 byte-fill, 2 const-fill, 3 zero-fill, 9 invalid
    ADD = np.array(
        [64, 0, 0, 0, 18, 17, 17, 17, 1, 17, 33, 49, 3, 2, 2, 2],
        dtype=np.int64,
    )
    LONG = np.array(
        [1, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0], dtype=np.int64
    )
    KIND = np.array(
        [0, 9, 9, 9, 1, 2, 2, 3, 0, 0, 0, 0, 1, 2, 2, 3], dtype=np.int64
    )
    # const-fill value per command (0x5/0xD '@', 0x6/0xE ' ')
    FILLV = np.zeros(16, dtype=np.uint8)
    FILLV[0x5] = FILLV[0xD] = ord("@")
    FILLV[0x6] = FILLV[0xE] = ord(" ")

    # the loop compacts its state to still-active rows each pass, so
    # every array op below is sized to the live wavefront, and no
    # masked writeback into full-size arrays is ever needed
    while ip.size:
        ctrl = buf[ip]
        cmd = ctrl >> 4
        kind = KIND[cmd]
        if (kind == 9).any():
            bad = int(cmd[kind == 9][0])
            raise ValueError(f"unknown RLE command {bad:#x}")
        hdr = LONG[cmd]  # count byte between ctrl and payload
        # a stream that ends inside the command header (or at a fill
        # byte) retires with its remaining output zero-filled — the
        # scalar walk stops at i == n; without this, the clamped
        # neighbor gathers below could read another row's bytes on
        # corrupt input
        alive = ip + 1 + hdr + (kind == 1) <= iend
        if not alive.all():
            ip, iend, op, oend = ip[alive], iend[alive], op[alive], oend[alive]
            ctrl, cmd, kind, hdr = (
                ctrl[alive], cmd[alive], kind[alive], hdr[alive]
            )
            if not ip.size:
                break
        ln = (ctrl & 0x0F).astype(np.int64)
        # count byte after ctrl (in-span where used: hdr==1 implies
        # ip+2 <= iend via the aliveness filter above)
        nb = buf[np.minimum(ip + 1, nb_total - 1)].astype(np.int64)
        cnt = (ln << (hdr << 3)) + nb * hdr + ADD[cmd]
        # defensive per-row clip (scalar version truncates at the end);
        # the floor at 0 covers rows whose logical cursor already ran
        # past the row end on a corrupt over-long stream
        eff = np.maximum(np.minimum(cnt, oend - op), 0)

        m = kind == 0
        if m.any():
            # copy payloads clip to the row's own span too, so an
            # over-long count degrades to zero-fill instead of
            # copying a neighboring subheader's bytes
            avail = np.maximum(iend - (ip + 1 + hdr), 0)
            scatter_copy(op[m], (ip + 1 + hdr)[m], np.minimum(eff, avail)[m])
        m = kind == 1
        if m.any():
            fv = buf[np.minimum((ip + 1 + hdr)[m], nb_total - 1)]
            scatter_fill(op[m], fv, eff[m])
        m = kind == 2
        if m.any():
            scatter_fill(op[m], FILLV[cmd[m]], eff[m])
        # kind 3 (zero fill): output is pre-zeroed, nothing to write

        # input advance: ctrl + count byte (long forms) + payload
        ip = ip + 1 + hdr + cnt * (kind == 0) + (kind == 1)
        op = op + cnt  # logical advance (clip only affects writes)
        keep = ip < iend
        if not keep.all():
            ip, iend, op, oend = ip[keep], iend[keep], op[keep], oend[keep]

    return out.reshape(r, row_length)


def rdc_decompress_rows(
    page: bytes, spans: list[tuple[int, int]], row_length: int
):
    """Batch SASYZCR2 decompression — the RDC sibling of
    rle_decompress_rows. One wavefront iteration executes one item
    (a literal run, one command, or a control-word load) for every
    still-active row. LZ pattern copies gather from the row's own
    already-written output; when the pattern overlaps (ofs < ln) the
    gather index is taken modulo ofs, which reproduces the byte-serial
    append semantics exactly (the copied region has period ofs).
    Byte-identical to the scalar rdc_decompress (equivalence-tested).
    """
    import numpy as np

    buf = np.frombuffer(page, dtype=np.uint8)
    nb_total = len(buf)
    r = len(spans)
    out = np.zeros(r * row_length, dtype=np.uint8)
    ip = np.fromiter((s for s, _ in spans), dtype=np.int64, count=r)
    iend = ip + np.fromiter((l for _, l in spans), dtype=np.int64, count=r)
    op = np.arange(r, dtype=np.int64) * row_length
    oend = op + row_length
    ctrl = np.zeros(r, dtype=np.int64)
    nbits = np.zeros(r, dtype=np.int64)

    # bit_length lookup for the 16-bit control word (literal-run scan)
    global _BITLEN16
    try:
        bl = _BITLEN16
    except NameError:
        bl = _BITLEN16 = np.array(
            [x.bit_length() for x in range(1 << 16)], dtype=np.int64
        )

    def gcount(cnt):
        cs = np.cumsum(cnt)
        return np.arange(int(cs[-1]), dtype=np.int64) - np.repeat(
            cs - cnt, cnt
        )

    def scatter_copy(dst, src, cnt):
        if not cnt.size or not int(cnt.sum()):
            return
        idx = gcount(cnt)
        out[np.repeat(dst, cnt) + idx] = buf[np.repeat(src, cnt) + idx]

    def scatter_fill(dst, val, cnt):
        if not cnt.size or not int(cnt.sum()):
            return
        idx = gcount(cnt)
        out[np.repeat(dst, cnt) + idx] = np.repeat(val, cnt)

    def scatter_lz(dst, ofs, cnt):
        """out[dst+i] = out[dst-ofs + (i mod ofs)] — exact overlap
        semantics of the byte-serial LZ append."""
        if not cnt.size or not int(cnt.sum()):
            return
        idx = gcount(cnt)
        rofs = np.repeat(ofs, cnt)
        src = np.repeat(dst - ofs, cnt) + idx % rofs
        out[np.repeat(dst, cnt) + idx] = out[src]

    while ip.size:
        # rows needing a fresh control word
        m_load = nbits == 0
        if m_load.any():
            sel = np.flatnonzero(m_load)
            p = ip[sel]
            # i+2 > n ends the scalar loop before reading a word
            ok = p + 2 <= iend[sel]
            c = (
                buf[np.minimum(p, nb_total - 1)].astype(np.int64) << 8
            ) | buf[np.minimum(p + 1, nb_total - 1)]
            c = np.where(ok, c, 0)
            # ctrl == 0 → 16 literal bytes immediately, word consumed
            z = ok & (c == 0)
            if z.any():
                s2 = sel[z]
                eff = np.maximum(
                    np.minimum(
                        np.minimum(16, oend[s2] - op[s2]),
                        iend[s2] - (p[z] + 2),
                    ),
                    0,
                )
                scatter_copy(op[s2], p[z] + 2, eff)
                op[s2] += 16
            ctrl[sel] = c
            nbits[sel] = np.where(ok & (c != 0), 16, 0)
            # !ok retires the row (cursor to end); ctrl==0 consumed
            # its 16 payload bytes as well as the word
            ip[sel] = np.where(ok, p + 2 + np.where(z, 16, 0), iend[sel])
        m = nbits > 0
        if m.any():
            sel = np.flatnonzero(m)
            cw = ctrl[sel]
            nb_ = nbits[sel]
            rem = cw & ((1 << nb_) - 1)
            topbit = ((cw >> (nb_ - 1)) & 1).astype(bool)

            # literal run: leading zero bits of the remaining word
            ml = ~topbit
            if ml.any():
                s2 = sel[ml]
                zeros = np.where(
                    rem[ml] == 0, nb_[ml], nb_[ml] - bl[rem[ml]]
                )
                # clip to input/output room
                eff = np.maximum(
                    np.minimum(
                        np.minimum(zeros, oend[s2] - op[s2]),
                        iend[s2] - ip[s2],
                    ),
                    0,
                )
                scatter_copy(op[s2], ip[s2], eff)
                ip[s2] += zeros
                op[s2] += zeros
                nbits[s2] -= zeros

            mc = topbit
            if mc.any():
                s2 = sel[mc]
                p = ip[s2]
                cb = buf[np.minimum(p, nb_total - 1)].astype(np.int64)
                cmd = cb >> 4
                low = cb & 0x0F
                b1 = buf[np.minimum(p + 1, nb_total - 1)].astype(np.int64)
                b2 = buf[np.minimum(p + 2, nb_total - 1)].astype(np.int64)

                is_srle = cmd == 0
                is_lrle = cmd == 1
                is_lpat = cmd == 2
                is_spat = cmd >= 3

                cnt = (
                    is_srle * (low + 3)
                    + is_lrle * (low + (b1 << 4) + 19)
                    + is_lpat * (b2 + 16)
                    + is_spat * cmd
                )
                # a stream ending at/inside this command (e.g. it
                # stops right after the control word, ip == iend)
                # retires with zero-fill like the scalar i==n exit —
                # otherwise the clamped gathers above hold a
                # neighbor's bytes and would scatter garbage fills
                adv = 1 + is_srle + 2 * is_lrle + 2 * is_lpat + is_spat
                alive = p + adv <= iend[s2]
                eff = np.maximum(np.minimum(cnt, oend[s2] - op[s2]), 0)
                eff = np.where(alive, eff, 0)

                mm = is_srle
                if mm.any():
                    scatter_fill(op[s2][mm], buf[np.minimum(p[mm] + 1, nb_total - 1)], eff[mm])
                mm = is_lrle
                if mm.any():
                    scatter_fill(op[s2][mm], buf[np.minimum(p[mm] + 2, nb_total - 1)], eff[mm])
                mm = is_lpat | is_spat
                if mm.any():
                    ofs = low[mm] + 3 + (b1[mm] << 4)
                    # a back-reference before the row start is corrupt;
                    # clamp the copy to what exists (scalar would read
                    # its own empty prefix and effectively emit zeros)
                    row_start = (op[s2][mm] // row_length) * row_length
                    ok2 = op[s2][mm] - ofs >= row_start
                    e2 = np.where(ok2, eff[mm], 0)
                    scatter_lz(op[s2][mm], ofs, e2)

                ip[s2] = np.where(alive, p + adv, iend[s2])
                op[s2] += np.where(alive, cnt, 0)
                nbits[s2] -= 1

        keep = ip < iend
        if not keep.all():
            ip, iend, op, oend = ip[keep], iend[keep], op[keep], oend[keep]
            ctrl, nbits = ctrl[keep], nbits[keep]

    return out.reshape(r, row_length)


def _lz_copy(out: bytearray, ofs: int, ln: int) -> None:
    """Back-reference copy with LZ overlap semantics: bytes appended
    during the copy are themselves sources when ln > ofs."""
    start = len(out) - ofs
    if ofs >= ln:
        out += out[start : start + ln]
        return
    seg = bytes(out[start:])  # length == ofs
    while len(seg) < ln:
        seg += seg
    out += seg[:ln]


def rdc_decompress(buf: bytes, result_length: int) -> bytes:
    """SASYZCR2 (Ross Data Compression) decompression (public spec).

    Batched: literal spans between command bits copy as slices (the
    per-byte append loop was the SAS scan's hot spot — a control word
    of 16 zero bits is one 16-byte slice copy now), and pattern
    back-references use chunked LZ copies instead of per-byte appends.
    """
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n:
        if i + 2 > n:
            break
        ctrl = (buf[i] << 8) | buf[i + 1]
        i += 2
        if ctrl == 0:  # 16 literal bytes at once (common in mixed data)
            out += buf[i : i + 16]
            i += 16
            continue
        mask = 0x8000
        while mask and i < n:
            if (ctrl & mask) == 0:
                j = i  # batch the run of literal (zero) bits
                while mask and (ctrl & mask) == 0:
                    j += 1
                    mask >>= 1
                out += buf[i:j]
                i = j
                continue
            cmd = buf[i] >> 4
            cnt = buf[i] & 0x0F
            i += 1
            # a stream truncated inside a command's header retires
            # with the remainder zero-filled (final pad), matching the
            # wavefront's aliveness filter — never IndexError. A
            # back-reference past the start of this row's output is
            # corrupt: emit zeros for its span (Python's negative
            # slice indices would otherwise wrap to the END of out)
            # and keep walking, exactly like the wavefront's clamp.
            if cmd == 0:  # short RLE
                out += buf[i : i + 1] * (cnt + 3)
                i += 1
            elif cmd == 1:  # long RLE
                if i + 2 > n:
                    i = n
                    break
                cnt += (buf[i] << 4) + 19
                i += 1
                out += buf[i : i + 1] * cnt
                i += 1
            elif cmd == 2:  # long pattern
                if i + 2 > n:
                    i = n
                    break
                ofs = cnt + 3 + (buf[i] << 4)
                i += 1
                ln = buf[i] + 16
                i += 1
                if ofs > len(out):
                    out += b"\x00" * ln
                elif ofs >= ln:  # inline the non-overlap fast path
                    start = len(out) - ofs
                    out += out[start : start + ln]
                else:
                    _lz_copy(out, ofs, ln)
            else:  # short pattern
                if i + 1 > n:
                    break
                ofs = cnt + 3 + (buf[i] << 4)
                i += 1
                if ofs > len(out):
                    out += b"\x00" * cmd
                elif ofs >= cmd:
                    start = len(out) - ofs
                    out += out[start : start + cmd]
                else:
                    _lz_copy(out, ofs, cmd)
            mask >>= 1
    if len(out) < result_length:
        out += b"\x00" * (result_length - len(out))
    return bytes(out[:result_length])


def _decompress_row(meta: SasMeta, raw: bytes) -> bytes:
    if len(raw) == meta.row_length:
        return raw
    if meta.compression == RLE:
        return rle_decompress(raw, meta.row_length)
    if meta.compression == RDC:
        return rdc_decompress(raw, meta.row_length)
    raise ValueError(
        f"row of {len(raw)} bytes != row_length {meta.row_length} without compression"
    )


def page_row_bytes(meta: SasMeta, page: bytes, rows_before: int) -> bytes:
    """Extract this page's rows as contiguous row_length-sized records.

    rows_before: global row count before this page (bounds the MIX-page
    row count at end of file)."""
    pr = _PageReader(meta, page)
    rl = meta.row_length
    if pr.page_type == PAGE_DATA_TYPE:
        start = meta.page_bit_offset + 8 + pr.subheader_count * meta.subheader_ptr_len
        n = pr.block_count
        return page[start : start + n * rl]
    if pr.page_type == PAGE_MIX_TYPE:
        x = meta.page_bit_offset + 8 + pr.subheader_count * meta.subheader_ptr_len
        start = x + (x % 8)  # the alignment quirk, kept bug-compatible
        n = min(meta.mix_page_row_count, max(meta.row_count - rows_before, 0))
        return page[start : start + n * rl]
    if pr.page_type in PAGE_META_TYPES:
        from polars_readstat_spark.sources.sas7bdat.meta import _SIGS

        chunks = []  # (kind, payload): raw bytes or an RLE span
        rle_spans: list[tuple[int, int]] = []
        for sh_off, sh_len, comp, styp in pr.subheader_pointers():
            if sh_len == 0 or comp == TRUNCATED_SUBHEADER_ID:
                continue
            if comp in (0, COMPRESSED_SUBHEADER_ID) and styp == COMPRESSED_SUBHEADER_TYPE:
                sig = page[sh_off : sh_off + meta.int_len]
                if _SIGS.get(sig) or _SIGS.get(sig[:4]):
                    continue  # metadata subheader, not row data
                if sh_len != rl and meta.compression == RLE:
                    # batch the page's RLE rows: one vectorized
                    # wavefront instead of a Python walk per row
                    chunks.append((1, len(rle_spans)))
                    rle_spans.append((sh_off, sh_len))
                else:
                    chunks.append(
                        (0, _decompress_row(meta, page[sh_off : sh_off + sh_len]))
                    )
        if rle_spans:
            mat = rle_decompress_rows(page, rle_spans, rl)
            if len(chunks) == len(rle_spans):
                return mat.tobytes()  # all-RLE page, already in order
            return b"".join(
                mat[payload].tobytes() if kind else payload
                for kind, payload in chunks
            )
        return b"".join(payload for _, payload in chunks)
    return b""


def page_compressed_items(meta: SasMeta, page: bytes):
    """Row items of a compressed file's META page WITHOUT decompressing:
    list of (0, raw_row_bytes) | (1, (offset, length) span). Returns
    None when the page is not a META page (caller falls back to
    page_row_bytes). This split lets the reader group many pages'
    compressed spans into one vectorized wavefront call — the batch
    size, not the page size, then sets the amortization."""
    from polars_readstat_spark.sources.sas7bdat.meta import _SIGS

    pr = _PageReader(meta, page)
    if pr.page_type not in PAGE_META_TYPES:
        return None
    rl = meta.row_length
    items: list[tuple[int, object]] = []
    for sh_off, sh_len, comp, styp in pr.subheader_pointers():
        if sh_len == 0 or comp == TRUNCATED_SUBHEADER_ID:
            continue
        if comp in (0, COMPRESSED_SUBHEADER_ID) and styp == COMPRESSED_SUBHEADER_TYPE:
            sig = page[sh_off : sh_off + meta.int_len]
            if _SIGS.get(sig) or _SIGS.get(sig[:4]):
                continue
            if sh_len == rl:
                items.append((0, page[sh_off : sh_off + rl]))
            elif meta.compression in (RLE, RDC):
                items.append((1, (sh_off, sh_len)))
            else:
                # undeclared compression with a short row: surface the
                # same error the scalar path raises
                _decompress_row(meta, page[sh_off : sh_off + sh_len])
    return items


def batch_decompress_pages(meta: SasMeta, pages_items) -> list[bytes]:
    """Decompress a GROUP of META pages' rows in one wavefront call.

    pages_items: [(page_bytes, items)] from page_compressed_items.
    Returns one row-bytes blob per page, rows in on-page order. The
    group's compressed spans concatenate into a single buffer so the
    vectorized decoder amortizes over the whole group (measured sweet
    spot ~5k-20k rows — pages alone are ~10x smaller)."""
    rl = meta.row_length
    bases: list[int] = []
    base = 0
    for page, _ in pages_items:
        bases.append(base)
        base += len(page)
    joined = (
        pages_items[0][0]
        if len(pages_items) == 1
        else b"".join(p for p, _ in pages_items)
    )
    spans: list[tuple[int, int]] = []
    for (page, items), pb in zip(pages_items, bases):
        for kind, payload in items:
            if kind == 1:
                spans.append((pb + payload[0], payload[1]))
    mat = None
    if spans:
        fn = (
            rle_decompress_rows
            if meta.compression == RLE
            else rdc_decompress_rows
        )
        mat = fn(joined, spans, rl)
    out: list[bytes] = []
    k = 0
    for page, items in pages_items:
        ncomp = sum(1 for kind, _ in items if kind == 1)
        if ncomp == len(items):
            out.append(mat[k : k + ncomp].tobytes() if ncomp else b"")
            k += ncomp
            continue
        parts: list[bytes] = []
        for kind, payload in items:
            if kind == 1:
                parts.append(mat[k].tobytes())
                k += 1
            else:
                parts.append(payload)
        out.append(b"".join(parts))
    return out


def page_row_count(meta: SasMeta, page_header: bytes, rows_before: int) -> int:
    """Row count from a page header alone (6 bytes after bit offset) —
    used by the driver's partition planner without reading page bodies."""
    pr = _PageReader(meta, page_header)
    if pr.page_type == PAGE_DATA_TYPE:
        return pr.block_count
    if pr.page_type == PAGE_MIX_TYPE:
        return min(meta.mix_page_row_count, max(meta.row_count - rows_before, 0))
    return 0  # meta/amd/comp pages carry no rows in uncompressed files
