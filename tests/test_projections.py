"""P2/P3/P4 shaping: API rows → records, nested UCAM payload → flattened
wear assignments (reference fixture shape tests/hooks/conftest.py:85-118)."""

from pyspark.sql import Row

from ideafast_etl_spark.operators.projections import (
    init_lifecycle,
    shape_api_rows,
    shape_ucam_patients,
)


def test_shape_api_rows_and_lifecycle(spark):
    raw = spark.createDataFrame(
        [("ref-1", "uid-3", Row(start_time=1639387320, stop_time=1639389120), "u://x")],
        "id string, device string, report struct<start_time:long,stop_time:long>, data_url string",
    )
    shaped = init_lifecycle(shape_api_rows(raw, "DRM"))
    r = shaped.first()
    assert r["manufacturer_ref"] == "ref-1"
    assert r["device_type"] == "DRM"
    assert r["meta"]["dreem_uid"] == "uid-3"
    assert str(r["start"]) == "2021-12-13 09:22:00"  # UTC (X5 divergence fix)
    assert len(r["hash"]) == 64
    # lifecycle rungs start NULL; is_uploaded defaults false
    for c in ("device_serial", "device_id", "patient_id", "dmp_dataset", "dmp_id"):
        assert r[c] is None
    assert r["is_uploaded"] is False


def test_shape_ucam_patients_explodes_and_parses(spark):
    payload = spark.createDataFrame(
        [
            (
                "NR1-DEVICE",
                [
                    Row(
                        subject_id="B-PATIENT",
                        disease=2,
                        start_Date="2021-11-04T00:00:00",
                        end_Date="2021-11-06T23:59:59",
                        deviations=None,
                        vtT_id=None,
                    ),
                    Row(
                        subject_id="A-PATIENT",
                        disease=1,
                        start_Date="2021-11-10T00:00:00",
                        end_Date=None,  # still wearing → open interval
                        deviations="swapped strap",
                        vtT_id="VT-9",
                    ),
                ],
            )
        ],
        "device_id string, patients array<struct<subject_id:string,disease:int,"
        "start_Date:string,end_Date:string,deviations:string,vtT_id:string>>",
    )
    flat = shape_ucam_patients(payload)
    rows = {r["patient_id"]: r for r in flat.collect()}
    assert set(rows) == {"A-PATIENT", "B-PATIENT"}
    assert str(rows["B-PATIENT"]["start_wear"]) == "2021-11-04 00:00:00"
    assert rows["A-PATIENT"]["end_wear"] is None
    assert rows["A-PATIENT"]["vttsma_id"] == "VT-9"
    assert rows["B-PATIENT"]["disease"] == 2
