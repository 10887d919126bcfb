"""Registry: type mapping, JSON round-trip, schema evolution (horizon
control-plane semantics)."""

import pytest
from pyspark.sql import types as T

from bharatmlstack_spark import fixtures
from bharatmlstack_spark.registry import (
    DataType,
    Entity,
    Feature,
    FeatureGroup,
    SchemaRegistry,
)


def test_type_mapping_scalars():
    assert DataType.FP32.spark_type == T.FloatType()
    assert DataType.FP64.spark_type == T.DoubleType()
    assert DataType.INT8.spark_type == T.ByteType()
    # unsigned widening (§1.2): next signed type that holds the range
    assert DataType.UINT8.spark_type == T.ShortType()
    assert DataType.UINT32.spark_type == T.LongType()
    assert DataType.UINT64.spark_type == T.DecimalType(20, 0)
    # fp16/fp8 compute as float (round-trip functions give storage semantics)
    assert DataType.FP16.spark_type == T.FloatType()
    assert DataType.FP8E5M2.spark_type == T.FloatType()


def test_type_mapping_vectors():
    t = DataType.FP32_VECTOR.spark_type
    assert isinstance(t, T.ArrayType) and t.elementType == T.FloatType()
    assert not t.containsNull
    assert DataType.UINT64_VECTOR.spark_type.elementType == T.DecimalType(20, 0)
    assert DataType.FP16_VECTOR.element == DataType.FP16


def test_all_30_types_present():
    """30 = 15 scalar + 15 vector, including StringVector — the full
    data_type.go:9-41 enumeration (SURVEY §1.2 count corrected in r10)."""
    assert len(DataType) == 30
    assert sum(1 for d in DataType if d.is_vector) == 15
    assert DataType.STRING_VECTOR.value == "StringVector"


def test_json_round_trip():
    reg = fixtures.user_registry()
    reg.entity("user").fg("demo_str").store_id = 2
    blob = reg.to_json()
    back = SchemaRegistry.from_json(blob)
    e = back.entity("user")
    assert e.key_columns == ["user_id"]
    assert e.fg("demo_str").store_id == 2
    assert e.fg("demo_vec").data_type == DataType.FP32_VECTOR
    assert e.fg("demo_vec").feature("taste_vec").vector_length == 8
    assert back.to_json() == blob


def test_unknown_lookups_raise():
    reg = fixtures.user_registry()
    with pytest.raises(KeyError):
        reg.entity("nope")
    with pytest.raises(KeyError):
        reg.entity("user").fg("nope")
    with pytest.raises(KeyError):
        reg.entity("user").fg("demo_str").feature("nope")


def test_evolve_appends_version():
    reg = fixtures.user_registry()
    fg = reg.entity("user").fg("demo_int32")
    v2 = reg.evolve("user", "demo_int32", [Feature("height", 0, default=170)])
    assert v2 == 2 and fg.active_version == 2
    feats = fg.version_features()
    assert [f.label for f in feats] == ["age", "height"]
    # sequences append-only, existing untouched
    assert feats[0].sequence == 0 and feats[1].sequence == 1
    # v1 unchanged
    assert [f.label for f in fg.version_features(1)] == ["age"]


def test_evolve_rejects_duplicate_label():
    reg = fixtures.user_registry()
    with pytest.raises(ValueError, match="already exists"):
        reg.evolve("user", "demo_int32", [Feature("age", 0)])
