"""S2→K9→K8 fused flow: distributed fetch → in-executor per-group zip →
upload, no driver staging."""

import io
import zipfile

from ideafast_etl_spark.sinks.upload import upload_group_archives
from ideafast_etl_spark.sources.files import distributed_fetch


def test_fetch_zip_upload_roundtrip(spark):
    refs = spark.createDataFrame(
        [
            ("ref-1", "u://a", "G1"),
            ("ref-2", "u://b", "G1"),
            ("ref-3", "u://c", "G2"),
        ],
        "manufacturer_ref string, data_url string, dmp_id string",
    )
    fetched = distributed_fetch(refs, lambda url: f"payload:{url}".encode())
    groups = fetched.join(
        refs.select("manufacturer_ref", "dmp_id"), "manufacturer_ref"
    )

    captured = {}

    def capture_uploader(dmp_id: str, zip_bytes: bytes) -> bool:
        # executor-side capture doesn't reach the driver; verify via returned
        # stats instead — but DO verify the zip is well-formed right here
        zf = zipfile.ZipFile(io.BytesIO(zip_bytes))
        assert zf.testzip() is None
        captured[dmp_id] = zf.namelist()
        return True

    out = {r["dmp_id"]: r for r in upload_group_archives(groups, capture_uploader).collect()}
    assert out["G1"]["n_files"] == 2 and out["G2"]["n_files"] == 1
    assert all(r["success"] for r in out.values())
    assert all(r["zip_bytes_len"] > 0 for r in out.values())


def test_upload_failure_reported_per_group(spark):
    groups = spark.createDataFrame(
        [("r1", b"x", "G1"), ("r2", b"y", "G2")],
        "manufacturer_ref string, content binary, dmp_id string",
    )
    out = {
        r["dmp_id"]: r["success"]
        for r in upload_group_archives(
            groups, lambda d, b: d != "G2"
        ).collect()
    }
    assert out == {"G1": True, "G2": False}


def test_zip_manifest_lists_entries_and_crc(spark):
    import io
    import zipfile
    import zlib

    from ideafast_etl_spark.sinks.archive import zip_manifest

    buf = io.BytesIO()
    payload_a, payload_b = b"hello" * 10, b"\x01\x02\x03"
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", payload_a)
        zf.writestr("dir/b.bin", payload_b)
    rows = [(1, bytearray(buf.getvalue())), (2, bytearray(b"not a zip"))]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    got = {
        (r.doc_id, r.entry_name): r
        for r in zip_manifest(df, id_col="doc_id").collect()
    }
    # corrupt payload yields no rows, valid one lists both entries
    assert set(got) == {(1, "a.txt"), (1, "dir/b.bin")}
    a = got[(1, "a.txt")]
    assert a.uncompressed_size == len(payload_a)
    assert a.crc32 == zlib.crc32(payload_a)
    assert a.method == "deflated"
    assert a.compressed_size < a.uncompressed_size  # deflate actually ran
