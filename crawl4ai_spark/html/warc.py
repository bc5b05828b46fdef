"""From-scratch WARC/1.0 writer + parser (ISO 28500, the Common-Crawl
archive format) — the same stdlib-only roundtrip discipline as
``html/pdf.py``: the writer emits REAL framed bytes (warcinfo record +
response records carrying full HTTP/1.1 messages), the parser walks the
Content-Length framing back out, and the DuckDB oracle recomputes every
exposed field from construction inputs without ever seeing the bytes.

No reference counterpart (crawl4ai fetches live pages); this is the
source/sink a Spark crawl at Common-Crawl scale reads and writes.
"""

from __future__ import annotations

import hashlib

WARC_VERSION = "WARC/1.0"
SOFTWARE = "crawl4ai-spark/0.4"
CRLF = b"\r\n"


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = WARC_VERSION.encode() + CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode() + CRLF
    head += f"Content-Length: {len(block)}".encode() + CRLF
    return head + CRLF + block + CRLF + CRLF


def _uuid_of(seed: str) -> str:
    h = hashlib.md5(seed.encode()).hexdigest()
    return (f"urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-"
            f"{h[16:20]}-{h[20:32]}")


REVISIT_PROFILE = ("http://netpreserve.org/warc/1.0/revisit/"
                   "identical-payload-digest")


def _finish(chunks: list[bytes], gzip_members: bool) -> bytes:
    """Concatenate record chunks; with ``gzip_members`` each record
    becomes its OWN gz member (mtime pinned for determinism) — the real
    Common-Crawl .warc.gz layout, which is what makes record-level
    random access possible in the compressed file: a reader seeks to a
    CDX offset and gunzips exactly one member."""
    if not gzip_members:
        return b"".join(chunks)
    import gzip as _gzip

    return b"".join(_gzip.compress(c, mtime=0) for c in chunks)


def build_warc(records: list[dict], *, date: str,
               gzip_members: bool = False) -> bytes:
    """``records``: dicts with uri, body (bytes), status (int),
    content_type (str). Emits one warcinfo record then one response
    record per input, deterministic record ids.

    A record carrying ``revisit: True`` emits an ISO 28500 *revisit*
    record instead (the Common-Crawl dedup mechanism for unchanged
    content on a re-crawl): identical-payload-digest profile,
    ``WARC-Refers-To`` = the deterministic response record id this writer
    emits for the same uri (so the referent resolves against the base
    segment without reading it), ``WARC-Payload-Digest`` from the
    record's ``payload_digest``, and a header-only 304 HTTP block — the
    unchanged body bytes are never written again."""
    info_block = f"software: {SOFTWARE}\r\nformat: WARC File Format 1.0".encode()
    chunks = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", date),
         ("WARC-Record-ID", _uuid_of("warcinfo")),
         ("Content-Type", "application/warc-fields")],
        info_block)]
    for r in records:
        if r.get("revisit"):
            http = b"HTTP/1.1 304 Not Modified\r\n\r\n"
            chunks.append(_record(
                [("WARC-Type", "revisit"),
                 ("WARC-Target-URI", r["uri"]),
                 ("WARC-Date", date),
                 ("WARC-Record-ID", _uuid_of("revisit:" + r["uri"])),
                 ("WARC-Refers-To", _uuid_of(r["uri"])),
                 ("WARC-Profile", REVISIT_PROFILE),
                 ("WARC-Payload-Digest", "md5:" + r["payload_digest"]),
                 ("Content-Type", "application/http;msgtype=response")],
                http))
            continue
        body = r["body"]
        http = (f"HTTP/1.1 {r['status']} OK\r\n"
                f"Content-Type: {r['content_type']}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        chunks.append(_record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", r["uri"]),
             ("WARC-Date", date),
             ("WARC-Record-ID", _uuid_of(r["uri"])),
             ("Content-Type", "application/http;msgtype=response")],
            http))
    return _finish(chunks, gzip_members)


def build_wet(records: list[dict], *, date: str,
              gzip_members: bool = False) -> bytes:
    """WET (the Common-Crawl extracted-text sibling of WARC): one
    warcinfo record then one ``conversion`` record per input —
    ``records``: dicts with uri, text (str). Conversion blocks are the
    bare UTF-8 text (no HTTP envelope); WARC-Refers-To links each record
    to the response record id the WARC writer would emit for the same
    uri, so a WET segment lines up 1:1 with its WARC segment."""
    info_block = (f"software: {SOFTWARE}\r\n"
                  "format: WARC File Format 1.0\r\n"
                  "conformsTo: WET").encode()
    chunks = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", date),
         ("WARC-Record-ID", _uuid_of("warcinfo-wet")),
         ("Content-Type", "application/warc-fields")],
        info_block)]
    for r in records:
        block = r["text"].encode("utf-8")
        chunks.append(_record(
            [("WARC-Type", "conversion"),
             ("WARC-Target-URI", r["uri"]),
             ("WARC-Date", date),
             ("WARC-Record-ID", _uuid_of("wet:" + r["uri"])),
             ("WARC-Refers-To", _uuid_of(r["uri"])),
             ("Content-Type", "text/plain")],
            block))
    return _finish(chunks, gzip_members)


def build_wat(records: list[dict], *, date: str,
              gzip_members: bool = False) -> bytes:
    """WAT (the Common-Crawl metadata sibling of WARC/WET): one warcinfo
    record then one ``metadata`` record per input — ``records``: dicts
    with uri, meta (a JSON-serializable dict, conventionally the CC
    ``Envelope`` structure). The payload is CANONICAL compact JSON
    (sorted keys, no whitespace, ensure_ascii) so the emitted bytes are a
    pure function of the metadata — the oracle can rebuild the exact
    string by concatenation. WARC-Refers-To links each record to the
    response record id the WARC writer emits for the same uri, so a WAT
    segment lines up 1:1 with its WARC segment."""
    import json

    info_block = (f"software: {SOFTWARE}\r\n"
                  "format: WARC File Format 1.0\r\n"
                  "conformsTo: WAT").encode()
    chunks = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", date),
         ("WARC-Record-ID", _uuid_of("warcinfo-wat")),
         ("Content-Type", "application/warc-fields")],
        info_block)]
    for r in records:
        block = json.dumps(r["meta"], sort_keys=True,
                           separators=(",", ":")).encode()
        chunks.append(_record(
            [("WARC-Type", "metadata"),
             ("WARC-Target-URI", r["uri"]),
             ("WARC-Date", date),
             ("WARC-Record-ID", _uuid_of("wat:" + r["uri"])),
             ("WARC-Refers-To", _uuid_of(r["uri"])),
             ("Content-Type", "application/json")],
            block))
    return _finish(chunks, gzip_members)


def parse_warc(data: bytes) -> list[dict]:
    """Walk the Content-Length framing; return one dict per record with
    warc_type, uri, date, and (for responses) status, content_type,
    payload bytes. Every record also carries its byte ``offset`` and
    framed ``length`` (head through trailing CRLFCRLF) — the two fields
    a CDX index needs so a reader can range-fetch single records.

    A ``.warc.gz`` blob (member-per-record, the published CC layout) is
    walked transparently; its records carry COMPRESSED member offsets
    and lengths — the true CC CDX semantics, since a reader range-
    fetches the gz member and gunzips exactly one record."""
    if data[:2] == b"\x1f\x8b":
        return _parse_warc_gz(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data.startswith(CRLF, pos):  # tolerate stray blank lines
            pos += 2
            continue
        rec_start = pos
        head_end = data.index(b"\r\n\r\n", pos)
        head_lines = data[pos:head_end].decode().split("\r\n")
        if head_lines[0] != WARC_VERSION:
            raise ValueError(f"bad WARC version line: {head_lines[0]!r}")
        headers = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        block = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        if data[pos:pos + 4] != CRLF + CRLF:
            raise ValueError("missing record trailer")
        pos += 4
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
        }
        if rec["warc_type"] in ("conversion", "metadata"):
            # WET conversion / WAT metadata: the block IS the payload
            # (bare text / canonical JSON — no HTTP envelope)
            rec["content_type"] = headers.get("content-type", "")
            rec["refers_to"] = headers.get("warc-refers-to", "")
            rec["payload"] = block
        if rec["warc_type"] == "response":
            http_end = block.index(b"\r\n\r\n")
            http_lines = block[:http_end].decode().split("\r\n")
            rec["status"] = int(http_lines[0].split(" ")[1])
            hh = {}
            for line in http_lines[1:]:
                k, _, v = line.partition(":")
                hh[k.strip().lower()] = v.strip()
            rec["content_type"] = hh.get("content-type", "")
            rec["payload"] = block[http_end + 4:]
        if rec["warc_type"] == "revisit":
            # header-only HTTP block; the payload lives in the record
            # WARC-Refers-To points at (identical-payload-digest profile)
            rec["status"] = int(block.decode().split("\r\n")[0].split(" ")[1])
            rec["refers_to"] = headers.get("warc-refers-to", "")
            rec["profile"] = headers.get("warc-profile", "")
            rec["payload_digest"] = headers.get("warc-payload-digest", "")
            rec["payload"] = b""
        rec["offset"] = rec_start
        rec["length"] = pos - rec_start
        records.append(rec)
    return records


def _parse_warc_gz(data: bytes) -> list[dict]:
    """Member-per-record gz walk: decompress each gz member in sequence
    (``unused_data`` marks the member boundary), parse the single record
    inside, and stamp it with the COMPRESSED member offset/length."""
    import zlib

    records = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        raw = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gz member")
        consumed = (n - pos) - len(d.unused_data)
        recs = parse_warc(raw)
        if len(recs) != 1:
            raise ValueError(
                f"gz member holds {len(recs)} records, expected 1")
        recs[0]["offset"] = pos
        recs[0]["length"] = consumed
        records.append(recs[0])
        pos += consumed
    return records


# ---------------------------------------------------------------------------
# CDX index emission — the third leg of the Common-Crawl publishing
# contract (WARC segments + CDX index over them; the seeder's
# parse_cc_index_blobs is the matching read side). Reference parity
# target: async_url_seeder.py consumes exactly these JSONL records.
# ---------------------------------------------------------------------------

def _urlkey(uri: str) -> str:
    """SURT url key (``com,example,www)/path?query``) — the CDX sort key
    that clusters one host's records together."""
    from urllib.parse import urlparse

    p = urlparse(uri)
    host = p.netloc.lower().split(":")[0].lstrip(".")
    key = ",".join(reversed(host.split("."))) + ")" + (p.path or "/")
    if p.query:
        key += "?" + p.query
    return key


def build_cdx(blob: bytes, filename: str) -> list[dict]:
    """Walk a WARC segment's REAL bytes and emit its CDX-JSONL index
    entries (response records only), sorted by (urlkey, timestamp, url)
    like a published .cdx.gz shard. ``offset``/``length`` are measured
    from the framing walk — not recomputed from inputs — so a defect in
    the writer's Content-Length bookkeeping shows up as a bad offset.
    Divergence from CC noted: ``digest`` is md5-hex (repo-wide hash
    discipline) rather than CC's sha1-base32; ``length`` is the
    uncompressed framed record length (CC stores the gz member length)."""
    entries = []
    for r in parse_warc(blob):
        if r["warc_type"] != "response":
            continue
        entries.append({
            "urlkey": _urlkey(r["uri"]),
            "timestamp": "".join(c for c in r["date"] if c.isdigit())[:14],
            "url": r["uri"],
            "mime": r["content_type"].split(";")[0].strip(),
            "status": str(r["status"]),
            "digest": hashlib.md5(r["payload"]).hexdigest(),
            "length": str(r["length"]),
            "offset": str(r["offset"]),
            "filename": filename,
        })
    entries.sort(key=lambda e: (e["urlkey"], e["timestamp"], e["url"]))
    return entries


def cdx_jsonl(entries: list[dict]) -> str:
    """Canonical CDX-JSONL encoding (sorted keys, compact separators) —
    a pure function of the entries, so an oracle can rebuild each line
    by string concatenation."""
    import json

    return "".join(
        json.dumps(e, sort_keys=True, separators=(",", ":")) + "\n"
        for e in entries)
