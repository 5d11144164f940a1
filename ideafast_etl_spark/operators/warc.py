"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl ingestion leg
(SURVEY.md §2.13): parse concatenated WARC records, plain or as per-record
gzip members (the Common Crawl .warc.gz convention), from binary columns.

A WARC record is ``WARC/1.0\\r\\n`` + header lines (``Name: value``) up to
a blank line, then exactly ``Content-Length`` payload bytes, then
``\\r\\n\\r\\n``. Member-gzipped archives concatenate one gzip stream per
record — stdlib zlib decompresses each member for real (no external
codec), so this leg is fully decodable, unlike the media bitstreams.

Scale posture: archives stay executor-side in Arrow batches; the manifest
scan emits bounded metadata rows (type/URI/lengths/sha256) — payload text
is only materialised for records the caller filters to.

Reference analog: binary-asset leg S2 (``ideafast_etl/hooks/drm.py:48-90``).
"""

from __future__ import annotations

import zlib


def _split_gzip_members(b: bytes) -> list[bytes] | None:
    """Decompress a concatenation of gzip members (one per WARC record in
    the Common Crawl convention); None if not gzip."""
    if len(b) < 2 or b[:2] != b"\x1f\x8b":
        return None
    out = []
    pos = 0
    while pos < len(b) and b[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=47)
        try:
            out.append(d.decompress(b[pos:]))
        except zlib.error:
            break
        consumed = len(b) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out


def parse_warc(b: bytes) -> list[dict] | None:
    """Parse a WARC archive (plain or member-gzipped) into record dicts:
    ``{headers: {name_lower: value}, payload: bytes}``. None when the
    input is neither gzip nor WARC; truncated trailing records are
    dropped. Never raises (untrusted binary column contract)."""
    try:
        members = _split_gzip_members(b)
        data = b"".join(members) if members is not None else b
        if not data.startswith(b"WARC/"):
            return None
        records = []
        pos = 0
        while pos < len(data):
            if not data.startswith(b"WARC/", pos):
                break
            head_end = data.find(b"\r\n\r\n", pos)
            if head_end < 0:
                break
            head = data[pos:head_end].decode("utf-8", "replace")
            lines = head.split("\r\n")
            headers: dict[str, str] = {}
            for line in lines[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers.get("content-length", ""))
            except ValueError:
                break
            body_start = head_end + 4
            if body_start + clen > len(data):
                break  # truncated payload: drop the partial record
            records.append(
                {
                    "version": lines[0].split("/", 1)[1] if "/" in lines[0] else "",
                    "headers": headers,
                    "payload": data[body_start : body_start + clen],
                }
            )
            pos = body_start + clen
            # per spec two CRLFs terminate the record block
            while data.startswith(b"\r\n", pos):
                pos += 2
        return records or None
    except (ValueError, IndexError):
        return None


def warc_manifest(
    df,
    content_col: str = "content",
    id_col: str = "doc_id",
):
    """1:N manifest scan over a binary column of WARC archives:
    (id, rec_idx, warc_type, target_uri, content_type, content_length,
    payload_sha256). Arrow ``mapInPandas``; non-WARC payloads yield no
    rows."""
    import hashlib

    import pandas as pd

    out_schema = (
        f"{id_col} long, rec_idx int, warc_type string, target_uri string, "
        "content_type string, content_length long, payload_sha256 string"
    )

    def _batches(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                recs = parse_warc(bytes(r[content_col]))
                if recs is None:
                    continue
                for i, rec in enumerate(recs):
                    h = rec["headers"]
                    rows.append(
                        {
                            id_col: r[id_col],
                            "rec_idx": i,
                            "warc_type": h.get("warc-type", ""),
                            "target_uri": h.get("warc-target-uri", ""),
                            "content_type": h.get("content-type", ""),
                            "content_length": len(rec["payload"]),
                            "payload_sha256": hashlib.sha256(
                                rec["payload"]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "rec_idx", "warc_type", "target_uri",
                    "content_type", "content_length", "payload_sha256",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(
        _batches, schema=out_schema
    )


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def encode_warc(
    records: list[tuple[str, str, str, bytes]],
    gzip_members: bool = False,
) -> bytes:
    """Write (warc_type, target_uri, content_type, payload) records as a
    WARC archive; ``gzip_members`` emits one gzip member per record (the
    .warc.gz convention), with fixed mtime/OS bytes so output is
    deterministic."""
    out = []
    for i, (wtype, uri, ctype, payload) in enumerate(records):
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
        )
        if uri:
            head += f"WARC-Target-URI: {uri}\r\n"
        head += (
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        )
        rec = head.encode() + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)
            body = co.compress(rec) + co.flush()
            # zero the gzip MTIME (bytes 4-8) for determinism
            body = body[:4] + b"\x00\x00\x00\x00" + body[8:]
            rec = body
        out.append(rec)
    return b"".join(out)
