"""Schema registry: entities, feature groups, versioned feature schemas.

Re-expresses the reference's registry-managed data model (SURVEY.md §1):

- Entity with an ordered composite primary key
  (ref: online-feature-store/internal/config/models.go:27-47)
- FeatureGroup: homogeneous-typed named features, active version, TTL,
  per-feature defaults (models.go:49-78)
- 30 data types: 15 scalar + 15 vector (including StringVector, Pascal-
  encoded in the reference's PSDB blocks)
  (ref: online-feature-store/internal/types/data_type.go:9-41)
- versioned schemas reconciled on read with default fallback
  (ref: internal/handler/feature/retrieve.go:833-858)

The reference keeps this in etcd behind the horizon control plane; here it is
plain Python objects (optionally (de)serialized to JSON) that compile to Spark
``StructType``s and expressions. Schemas are explicit and fixed — never
inferred.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from pyspark.sql import types as T


class DataType(str, Enum):
    """The reference's 30-value type system (data_type.go:9-41)."""

    FP8E5M2 = "FP8E5M2"
    FP8E4M3 = "FP8E4M3"
    FP16 = "FP16"
    FP32 = "FP32"
    FP64 = "FP64"
    INT8 = "Int8"
    INT16 = "Int16"
    INT32 = "Int32"
    INT64 = "Int64"
    UINT8 = "Uint8"
    UINT16 = "Uint16"
    UINT32 = "Uint32"
    UINT64 = "Uint64"
    STRING = "String"
    BOOL = "Bool"
    FP8E5M2_VECTOR = "FP8E5M2Vector"
    FP8E4M3_VECTOR = "FP8E4M3Vector"
    FP16_VECTOR = "FP16Vector"
    FP32_VECTOR = "FP32Vector"
    FP64_VECTOR = "FP64Vector"
    INT8_VECTOR = "Int8Vector"
    INT16_VECTOR = "Int16Vector"
    INT32_VECTOR = "Int32Vector"
    INT64_VECTOR = "Int64Vector"
    UINT8_VECTOR = "Uint8Vector"
    UINT16_VECTOR = "Uint16Vector"
    UINT32_VECTOR = "Uint32Vector"
    UINT64_VECTOR = "Uint64Vector"
    # DataTypeStringVector (data_type.go:39): vectors of Pascal-encoded
    # strings in the reference's PSDB v2 blocks
    # (perm_storage_datablock_v2.go:576-626); ArrayType(StringType) here
    STRING_VECTOR = "StringVector"
    BOOL_VECTOR = "BoolVector"

    @property
    def is_vector(self) -> bool:
        return self.name.endswith("_VECTOR")

    @property
    def element(self) -> "DataType":
        """Scalar element type of a vector type (identity for scalars)."""
        return DataType[self.name.removesuffix("_VECTOR")] if self.is_vector else self

    @property
    def spark_type(self) -> T.DataType:
        """Spark storage/compute type.

        Unsigned ints widen to the next signed type that holds the full range
        (uint64 → Decimal(20,0)); fp16/fp8 compute as float with quantization
        round-trip functions (functions/quantize.py) providing storage
        semantics. SURVEY.md §1.2 table.
        """
        if self.is_vector:
            return T.ArrayType(self.element.spark_type, containsNull=False)
        return _SCALAR_SPARK[self]

    @property
    def is_narrow_float(self) -> bool:
        """True for formats parquet can't hold natively (fp16/fp8): stored
        as integer bit patterns at 2x/4x density vs FLOAT (ref:
        perm_storage_datablock_v2.go:365-392 packs these byte-exact)."""
        return self.element.name in ("FP16", "FP8E5M2", "FP8E4M3")

    @property
    def storage_spark_type(self) -> T.DataType:
        """On-disk type: SMALLINT bit pattern for fp16, TINYINT code for
        fp8; identical to spark_type for everything else."""
        if self.is_vector:
            return T.ArrayType(self.element.storage_spark_type, containsNull=True)
        if self.name == "FP16":
            return T.ShortType()
        if self.name in ("FP8E5M2", "FP8E4M3"):
            return T.ByteType()
        return self.spark_type

    @property
    def precision_rank(self) -> int:
        """Rank for quantized-projection compatibility: a feature may only be
        projected at equal-or-lower precision (ref:
        internal/quantization/quantization_utils.go:70-102)."""
        return _PRECISION_RANK[self.element]


_SCALAR_SPARK: dict[DataType, T.DataType] = {
    DataType.FP8E5M2: T.FloatType(),
    DataType.FP8E4M3: T.FloatType(),
    DataType.FP16: T.FloatType(),
    DataType.FP32: T.FloatType(),
    DataType.FP64: T.DoubleType(),
    DataType.INT8: T.ByteType(),
    DataType.INT16: T.ShortType(),
    DataType.INT32: T.IntegerType(),
    DataType.INT64: T.LongType(),
    DataType.UINT8: T.ShortType(),
    DataType.UINT16: T.IntegerType(),
    DataType.UINT32: T.LongType(),
    DataType.UINT64: T.DecimalType(20, 0),
    DataType.STRING: T.StringType(),
    DataType.BOOL: T.BooleanType(),
}

# fp64 > fp32 > fp16 > fp8* ; ints ranked by width. Quantized projection may
# only move DOWN this ranking (quantization_utils.go:70-102).
_PRECISION_RANK: dict[DataType, int] = {
    DataType.FP64: 40,
    DataType.FP32: 30,
    DataType.FP16: 20,
    DataType.FP8E5M2: 10,
    DataType.FP8E4M3: 10,
    DataType.INT64: 40,
    DataType.UINT64: 40,
    DataType.INT32: 30,
    DataType.UINT32: 30,
    DataType.INT16: 20,
    DataType.UINT16: 20,
    DataType.INT8: 10,
    DataType.UINT8: 10,
    DataType.STRING: 0,
    DataType.BOOL: 0,
}


@dataclass
class Feature:
    """A named slot in a feature-group version (models.go:68-78)."""

    label: str
    sequence: int
    default: Any = None
    string_length: int = 0  # max chars for STRING (+ per StringVector element)
    vector_length: int = 0  # fixed length for *Vector features


@dataclass
class FeatureGroup:
    """Homogeneous-typed feature group under an entity (models.go:49-61).

    ``features`` is the versioned schema map: version -> ordered feature list.
    Rows carry the version they were written with; reads reconcile against
    ``active_version`` with per-feature default fallback (retrieve.go:833-858).
    """

    label: str
    fg_id: int
    data_type: DataType
    features: dict[int, list[Feature]]
    active_version: int = 1
    ttl_seconds: int = 0  # 0 = no expiry
    store_id: int = 0  # multi-store routing (models.go:52 StoreId)

    def version_features(self, version: int | None = None) -> list[Feature]:
        v = self.active_version if version is None else version
        return self.features[v]

    def feature(self, label: str, version: int | None = None) -> Feature:
        for f in self.version_features(version):
            if f.label == label:
                return f
        raise KeyError(f"unknown feature {label!r} in FG {self.label!r}")

    def column_name(self, feature_label: str) -> str:
        return f"{self.label}__{feature_label}"

    @property
    def spark_fields(self) -> list[T.StructField]:
        return [
            T.StructField(self.column_name(f.label), self.data_type.spark_type, True)
            for f in self.version_features()
        ]


@dataclass
class Entity:
    """Top-level namespace with ordered composite PK (models.go:27-47)."""

    label: str
    key_columns: list[str]
    feature_groups: dict[str, FeatureGroup] = field(default_factory=dict)

    def fg(self, label: str) -> FeatureGroup:
        try:
            return self.feature_groups[label]
        except KeyError:
            raise KeyError(f"unknown feature group {label!r} on entity {self.label!r}")


class SchemaRegistry:
    """In-process registry keyed by entity label.

    The reference's horizon/etcd control plane reduced to a dict + JSON
    round-trip (horizon/internal/online-feature-store/router/router.go:16-51 —
    the CRUD surface; approval workflow is serving infra, out of scope).
    """

    def __init__(self) -> None:
        self._entities: dict[str, Entity] = {}

    def register(self, entity: Entity) -> Entity:
        self._entities[entity.label] = entity
        return entity

    def entity(self, label: str) -> Entity:
        try:
            return self._entities[label]
        except KeyError:
            raise KeyError(f"unknown entity {label!r}")

    def entities(self) -> list[str]:
        return sorted(self._entities)

    def evolve(
        self,
        entity_label: str,
        fg_label: str,
        add_features: list[Feature],
        activate: bool = True,
    ) -> int:
        """Create the next schema version of an FG by appending features
        (the horizon edit-feature flow: versions are append-only, existing
        sequences immutable, new features get the next sequence numbers).

        Returns the new version number. Old rows keep their written
        ``schema_version``; reads reconcile with per-feature default
        fallback (retrieve.go:833-858 — exercised in
        tests/test_feature_store.py::test_schema_version_reconcile).
        """
        fg = self.entity(entity_label).fg(fg_label)
        current = fg.version_features(fg.active_version)
        next_seq = max((f.sequence for f in current), default=-1) + 1
        existing_labels = {f.label for f in current}
        new_feats = list(current)
        for i, f in enumerate(add_features):
            if f.label in existing_labels:
                raise ValueError(f"feature {f.label!r} already exists in FG {fg_label!r}")
            new_feats.append(
                Feature(
                    label=f.label,
                    sequence=next_seq + i,
                    default=f.default,
                    string_length=f.string_length,
                    vector_length=f.vector_length,
                )
            )
        new_version = max(fg.features) + 1
        fg.features[new_version] = new_feats
        if activate:
            fg.active_version = new_version
        return new_version

    # -- JSON round-trip (the registry is explicit metadata, never inferred) --

    def to_json(self) -> str:
        def enc(o: Any) -> Any:
            if isinstance(o, Entity):
                return {
                    "label": o.label,
                    "key_columns": o.key_columns,
                    "feature_groups": {k: enc(v) for k, v in o.feature_groups.items()},
                }
            if isinstance(o, FeatureGroup):
                return {
                    "label": o.label,
                    "fg_id": o.fg_id,
                    "data_type": o.data_type.value,
                    "active_version": o.active_version,
                    "ttl_seconds": o.ttl_seconds,
                    "store_id": o.store_id,
                    "features": {
                        str(v): [vars(f) for f in feats] for v, feats in o.features.items()
                    },
                }
            raise TypeError(type(o))

        return json.dumps({k: enc(v) for k, v in self._entities.items()}, indent=2)

    @classmethod
    def from_json(cls, payload: str) -> "SchemaRegistry":
        reg = cls()
        for label, e in json.loads(payload).items():
            fgs = {}
            for fglabel, fg in e["feature_groups"].items():
                fgs[fglabel] = FeatureGroup(
                    label=fg["label"],
                    fg_id=fg["fg_id"],
                    data_type=DataType(fg["data_type"]),
                    active_version=fg["active_version"],
                    ttl_seconds=fg["ttl_seconds"],
                    store_id=fg.get("store_id", 0),
                    features={
                        int(v): [Feature(**f) for f in feats]
                        for v, feats in fg["features"].items()
                    },
                )
            reg.register(Entity(label=label, key_columns=e["key_columns"], feature_groups=fgs))
        return reg
