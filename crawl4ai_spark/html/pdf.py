"""Naive PDF build + parse — the NaivePDFProcessorStrategy analog.

The reference processes PDFs with pypdf
(/root/reference/crawl4ai/processors/pdf/processor.py:57
``NaivePDFProcessorStrategy``: per-page ``raw_text`` extraction via a
text-visitor, ``PDFMetadata`` title/author/producer/created/pages/encrypted
at :415-437). No PDF library ships in this sandbox, so this module
implements the NAIVE SUBSET of ISO 32000 needed for that parity surface
from scratch, stdlib-only:

- writer: deterministic single-font PDFs — catalog → page tree → one
  FlateDecode (or raw) content stream per page of ``Tj`` text-show
  operators, an /Info dictionary, a classic xref table. Used to synthesize
  test corpora (the sandbox has no real PDFs; TESTDATA carries none).
- parser: header version, /Info metadata (Title/Author/Producer/
  CreationDate in PDF ``D:YYYYMMDDHHmmSS`` form), page count from the page
  tree /Count (fallback: counting /Type /Page), per-page text by decoding
  content streams (FlateDecode via zlib) and evaluating ``Tj``/``TJ``/``'``
  text operators with full PDF string-escape handling (\\( \\) \\\\ \\n
  \\r \\t octal), ``encrypted`` from /Encrypt presence.

The writer⇄parser pair is honest round-trip machinery, not a self-oracle
shortcut: the Spark query builds REAL bytes and the parser re-derives
everything from those bytes alone; the DuckDB oracle recomputes the
expected text/metadata from the construction inputs, so any parser or
writer defect breaks the hash match. Strings are written as UTF-8 bytes
(documented naive-subset deviation: conformant PDF would use PDFDocEncoding
/ UTF-16BE — pinned in tests).
"""

from __future__ import annotations

import re
import zlib

PDF_VERSION = "1.4"
PRODUCER = "crawl4ai-spark-naive-pdf"


# ---------------------------------------------------------------- writer ---

def _esc(s: str) -> bytes:
    """PDF literal-string escaping for ( ) \\ and control chars."""
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out).encode("utf-8")


def build_pdf(pages: list[str], *, title: str = "", author: str = "",
              creation_date: str = "D:20240101000000",
              compress: bool = True,
              images: list[list[dict]] | None = None) -> bytes:
    """Minimal deterministic PDF: one Tj line per text line per page.

    ``images`` (optional) embeds per-page image XObjects — reference parity
    for ``NaivePDFProcessorStrategy``'s ``extract_images=True`` per-page
    ``images`` list (processors/pdf/processor.py:41,58-70). One list per
    page; each image is ``{"width": int, "height": int, "pixels": bytes
    (w*h*3 DeviceRGB), "compress": bool}`` — ``compress=True`` stores the
    sample stream FlateDecode'd, else raw (the two filters the naive parser
    decodes)."""
    page_obj_ids = []
    content_ids = []
    n = max(1, len(pages))
    # object layout: 1=catalog, 2=pages, 3=font, then per page
    # ([image XObjects...], content, page) — build bodies with predicted ids
    catalog_id, pages_id, font_id = 1, 2, 3
    next_id = 4
    bodies: dict[int, bytes] = {}
    for i in range(n):
        text = pages[i] if pages else ""
        page_images = (images[i] if images and i < len(images) else []) or []
        img_ids: list[int] = []
        for img in page_images:
            iid = next_id
            next_id += 1
            w, h = int(img["width"]), int(img["height"])
            raw = bytes(img["pixels"])
            if len(raw) != w * h * 3:
                raise ValueError(f"image sample size {len(raw)} != {w}x{h}x3")
            hdr = (b"<< /Type /XObject /Subtype /Image /Width "
                   + str(w).encode() + b" /Height " + str(h).encode()
                   + b" /ColorSpace /DeviceRGB /BitsPerComponent 8")
            if img.get("compress", True):
                z = zlib.compress(raw)
                bodies[iid] = (hdr + b" /Filter /FlateDecode /Length "
                               + str(len(z)).encode() + b" >>\nstream\n" + z
                               + b"\nendstream")
            else:
                bodies[iid] = (hdr + b" /Length " + str(len(raw)).encode()
                               + b" >>\nstream\n" + raw + b"\nendstream")
            img_ids.append(iid)
        lines = text.split("\n") if text else [""]
        ops = [b"BT /F1 12 Tf 72 720 Td 14 TL"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append(b"T*")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        for k, img in enumerate(page_images):
            # paint each image at its natural size, stacked from the origin
            ops.append(b"q " + str(int(img["width"]) * 8).encode() + b" 0 0 "
                       + str(int(img["height"]) * 8).encode() + b" 72 "
                       + str(72 + 80 * k).encode()
                       + b" cm /Im" + str(k).encode() + b" Do Q")
        stream = b"\n".join(ops)
        cid, pid = next_id, next_id + 1
        next_id += 2
        if compress:
            z = zlib.compress(stream)
            bodies[cid] = (b"<< /Length " + str(len(z)).encode()
                           + b" /Filter /FlateDecode >>\nstream\n" + z
                           + b"\nendstream")
        else:
            bodies[cid] = (b"<< /Length " + str(len(stream)).encode()
                           + b" >>\nstream\n" + stream + b"\nendstream")
        res = b"/Font << /F1 3 0 R >>"
        if img_ids:
            res += (b" /XObject << "
                    + b" ".join(b"/Im%d %d 0 R" % (k, iid)
                                for k, iid in enumerate(img_ids))
                    + b" >>")
        bodies[pid] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                       b"/Resources << " + res + b" >> /Contents "
                       + str(cid).encode() + b" 0 R >>")
        content_ids.append(cid)
        page_obj_ids.append(pid)

    kids = b"[" + b" ".join(str(p).encode() + b" 0 R" for p in page_obj_ids) + b"]"
    bodies[catalog_id] = b"<< /Type /Catalog /Pages 2 0 R >>"
    bodies[pages_id] = (b"<< /Type /Pages /Kids " + kids + b" /Count "
                        + str(n).encode() + b" >>")
    bodies[font_id] = (b"<< /Type /Font /Subtype /Type1 "
                       b"/BaseFont /Helvetica >>")
    info_id = next_id
    bodies[info_id] = (b"<< /Title (" + _esc(title) + b") /Author ("
                       + _esc(author) + b") /Producer (" + _esc(PRODUCER)
                       + b") /CreationDate (" + creation_date.encode() + b") >>")

    out = bytearray(b"%PDF-" + PDF_VERSION.encode() + b"\n")
    offsets = {}
    for oid in sorted(bodies):
        offsets[oid] = len(out)
        out += str(oid).encode() + b" 0 obj\n" + bodies[oid] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = len(bodies) + 1
    out += b"xref\n0 " + str(n_objs).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for oid in sorted(bodies):
        out += ("%010d 00000 n \n" % offsets[oid]).encode()
    out += (b"trailer\n<< /Size " + str(n_objs).encode()
            + b" /Root 1 0 R /Info " + str(info_id).encode() + b" 0 R >>\n"
            + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


# ---------------------------------------------------------------- parser ---

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)


def _unesc(raw: bytes) -> str:
    """Decode a PDF literal string body (escapes + octal), UTF-8 bytes."""
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):  # backslash
            nxt = raw[i + 1]
            i += 2
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                      0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if nxt in mapped:
                out.append(mapped[nxt])
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                digits = [nxt - 0x30]
                while (len(digits) < 3 and i < len(raw)
                       and 0x30 <= raw[i] <= 0x37):
                    digits.append(raw[i] - 0x30)
                    i += 1
                val = 0
                for d in digits:
                    val = val * 8 + d
                out.append(val & 0xFF)
            elif nxt == 0x0A:  # line continuation
                pass
            else:  # unknown escape: literal next byte
                out.append(nxt)
        else:
            out.append(b)
            i += 1
    return out.decode("utf-8", errors="replace")


def _read_literal_strings(data: bytes) -> list[bytes]:
    """All top-level ( ... ) literal strings, honoring escapes + nesting."""
    out, i = [], 0
    while i < len(data):
        if data[i] == 0x28:  # (
            depth, j, buf = 1, i + 1, bytearray()
            while j < len(data) and depth:
                b = data[j]
                if b == 0x5C and j + 1 < len(data):
                    buf += data[j:j + 2]
                    j += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                buf.append(b)
                j += 1
            out.append(bytes(buf))
            i = j
        else:
            i += 1
    return out


def _dict_string_value(obj: bytes, key: bytes) -> str | None:
    m = re.search(re.escape(key) + rb"\s*\(", obj)
    if not m:
        return None
    strings = _read_literal_strings(obj[m.end() - 1:])
    return _unesc(strings[0]) if strings else None


_TEXT_OP_RE = re.compile(rb"\)\s*(Tj|')")


def _stream_text(stream: bytes) -> str:
    """Evaluate text-showing operators of a decoded content stream:
    Tj and ' append their string; T* / ' start a new line; TJ arrays
    concatenate their string elements."""
    lines: list[str] = [""]
    i = 0
    while i < len(stream):
        b = stream[i]
        if b == 0x28:  # literal string: read it, then look at the operator
            depth, j, buf = 1, i + 1, bytearray()
            while j < len(stream) and depth:
                c = stream[j]
                if c == 0x5C and j + 1 < len(stream):
                    buf += stream[j:j + 2]
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                buf.append(c)
                j += 1
            tail = stream[j:j + 8]
            op = tail.strip().split()[0] if tail.strip() else b""
            if op.startswith(b"'"):
                lines.append(_unesc(bytes(buf)))
            else:  # Tj or TJ element
                lines[-1] += _unesc(bytes(buf))
            i = j
        elif stream[i:i + 2] == b"T*":
            lines.append("")
            i += 2
        else:
            i += 1
    return "\n".join(lines)


def parse_pdf(data: bytes) -> dict:
    """Parse the naive subset; raises ValueError on non-PDF input."""
    head = re.match(rb"%PDF-(\d+\.\d+)", data)
    if not head:
        raise ValueError("not a PDF: missing %PDF header")
    version = head.group(1).decode()

    objects = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}
    encrypted = b"/Encrypt" in data[data.rfind(b"trailer"):] if b"trailer" in data else False

    # metadata from the /Info object (the object containing /Title or
    # /Producer keys outside any stream)
    title = author = producer = created = None
    for obj in objects.values():
        if b"/Producer" in obj and b"stream" not in obj:
            title = _dict_string_value(obj, b"/Title")
            author = _dict_string_value(obj, b"/Author")
            producer = _dict_string_value(obj, b"/Producer")
            created = _dict_string_value(obj, b"/CreationDate")
            break

    # page tree: /Type /Pages carries /Count; each /Type /Page carries
    # /Contents N 0 R and (optionally) /Resources /XObject image refs
    n_pages = 0
    page_content_ids: list[int] = []
    page_image_ids: list[list[int]] = []
    for obj in objects.values():
        if re.search(rb"/Type\s*/Pages\b", obj):
            m = re.search(rb"/Count\s+(\d+)", obj)
            if m:
                n_pages = int(m.group(1))
        elif re.search(rb"/Type\s*/Page\b", obj):
            m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", obj)
            if m:
                page_content_ids.append(int(m.group(1)))
                # /ImK N 0 R refs in resource order (sorted by K)
                refs = re.findall(rb"/Im(\d+)\s+(\d+)\s+\d+\s+R", obj)
                page_image_ids.append(
                    [int(oid) for _, oid in
                     sorted(refs, key=lambda r: int(r[0]))])
    if n_pages == 0:
        n_pages = len(page_content_ids)

    def _stream_bytes(obj: bytes) -> bytes | None:
        start = re.search(rb"stream\r?\n", obj)
        if not start:
            return None
        ln = re.search(rb"/Length\s+(\d+)", obj)
        if ln:
            # exact byte count from /Length — a delimiter regex would eat a
            # trailing 0x0D of the (binary) Flate data as part of its own
            # \r?\n and truncate the stream
            raw = obj[start.end():start.end() + int(ln.group(1))]
        else:
            sm = _STREAM_RE.search(obj)
            raw = sm.group(1) if sm else b""
        if re.search(rb"/Filter\s*/FlateDecode", obj):
            raw = zlib.decompress(raw)
        return raw

    pages: list[str] = []
    for cid in page_content_ids:
        raw = _stream_bytes(objects.get(cid, b""))
        pages.append(_stream_text(raw) if raw is not None else "")

    # per-page image XObjects (reference processor.py:58-70 extract_images):
    # everything below is re-derived from the PDF bytes alone
    images: list[list[dict]] = []
    for img_ids in page_image_ids:
        page_imgs = []
        for oid in img_ids:
            obj = objects.get(oid, b"")
            if not re.search(rb"/Subtype\s*/Image\b", obj):
                continue
            w = re.search(rb"/Width\s+(\d+)", obj)
            h = re.search(rb"/Height\s+(\d+)", obj)
            cs = re.search(rb"/ColorSpace\s*/(\w+)", obj)
            bpc = re.search(rb"/BitsPerComponent\s+(\d+)", obj)
            data = _stream_bytes(obj) or b""
            page_imgs.append({
                "width": int(w.group(1)) if w else 0,
                "height": int(h.group(1)) if h else 0,
                "colorspace": cs.group(1).decode() if cs else None,
                "bits_per_component": int(bpc.group(1)) if bpc else None,
                "filter": ("FlateDecode"
                           if re.search(rb"/Filter\s*/FlateDecode", obj)
                           else "raw"),
                "data": data,
            })
        images.append(page_imgs)

    return {
        "version": version,
        "title": title,
        "author": author,
        "producer": producer,
        "created": created,
        "n_pages": n_pages,
        "encrypted": encrypted,
        "pages": pages,
        "images": images,
        "text": "\n".join(pages),
    }
