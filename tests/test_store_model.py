"""Model-based StateStore test: random operation sequences (hypothesis)
checked against a plain-dict model after every step, plus time-travel
readback of retained versions.

Covers the interaction surface the example-based tests hit one at a time:
append_new's anti-join insert + in-batch dedup, merge_non_overwrite's
fill-NULL-only contract (including partition-selective merges), compact's
no-semantic-change contract, and keep_versions time travel."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ideafast_etl_spark.state.store import StateStore

KEYS = [f"k{i}" for i in range(8)]
DEVICES = ["DRM", "BTF"]

SCHEMA = StructType(
    [
        StructField("hash", StringType()),
        StructField("device_type", StringType()),
        StructField("val", LongType()),
        StructField("flag", StringType()),
    ]
)

# an op is one of:
#   ("append", [(key, has_flag)]) — val derived from key; flag NULL unless has_flag
#   ("fill", [(key, flag_value)]) — merge_non_overwrite on flag
#   ("fill_part", device, [(key, flag_value)]) — partition-selective merge
#   ("compact",)
_append = st.tuples(
    st.just("append"),
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.booleans()),
        min_size=1, max_size=4, unique_by=lambda t: t[0],
    ),
)
_fill = st.tuples(
    st.just("fill"),
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(["A", "B"])),
        min_size=1, max_size=3, unique_by=lambda t: t[0],
    ),
)
_fill_part = st.tuples(
    st.just("fill_part"),
    st.sampled_from(DEVICES),
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(["C", "D"])),
        min_size=1, max_size=3, unique_by=lambda t: t[0],
    ),
)
_compact = st.tuples(st.just("compact"))
OPS = st.lists(
    st.one_of(_append, _fill, _fill_part, _compact), min_size=1, max_size=5
)


def _dev(key: str) -> str:
    return DEVICES[int(key[1:]) % 2]


def _row(key: str, has_flag: bool) -> dict:
    return {
        "hash": key,
        "device_type": _dev(key),
        "val": int(key[1:]) * 10,
        "flag": "init" if has_flag else None,
    }


def _read_all(store: StateStore, version=None):
    return sorted(
        (r.hash, r.device_type, r.val, r.flag)
        for r in store.read(version).collect()
    )


def _model_rows(model: dict):
    return sorted(
        (r["hash"], r["device_type"], r["val"], r["flag"])
        for r in model.values()
    )


@given(ops=OPS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_store_matches_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("store_model"))
    store = StateStore(spark, path, keep_versions=3)
    model: dict[str, dict] = {}
    history: list[list] = []  # model snapshot per published version

    def publish():
        v = store.current_version()
        if v is not None and (not history or history[-1][0] != v):
            history.append([v, _model_rows(model)])

    for op in ops:
        if op[0] == "append":
            batch = [_row(k, hf) for k, hf in op[1]]
            df = spark.createDataFrame(batch, SCHEMA)
            inserted = store.append_new(df)
            fresh = [r for r in batch if r["hash"] not in model]
            assert inserted == len(fresh)
            for r in fresh:
                model[r["hash"]] = dict(r)
        elif op[0] == "fill":
            upd = spark.createDataFrame(
                [(k, v) for k, v in op[1]], ["hash", "flag"]
            )
            if store.exists():
                store.merge_non_overwrite(upd, set_cols=("flag",))
                for k, v in op[1]:
                    if k in model and model[k]["flag"] is None:
                        model[k]["flag"] = v
        elif op[0] == "fill_part":
            dev, pairs = op[1], op[2]
            upd = spark.createDataFrame(pairs, ["hash", "flag"])
            if store.exists():
                store.merge_non_overwrite(
                    upd, set_cols=("flag",), partition_value=dev
                )
                for k, v in pairs:
                    r = model.get(k)
                    if r and r["device_type"] == dev and r["flag"] is None:
                        r["flag"] = v
        elif op[0] == "compact":
            if store.exists():
                store.compact()  # must not change visible rows
        if store.exists():
            assert _read_all(store) == _model_rows(model)
            publish()

    # time travel: the retained tail of published versions must replay
    if history:
        for v, snap in history[-store.keep_versions:]:
            if v in store.versions():
                assert _read_all(store, version=v) == snap
