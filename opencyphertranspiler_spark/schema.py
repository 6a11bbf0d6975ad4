"""Property-graph schema registry.

Mirrors the reference data model (SURVEY.md §1.1): nodes/edges are backed 1:1
by relational tables; a node has a single id column; an edge has a source-id
and sink-id column; an edge type is identified by the directional triple
``source_label@verb@sink_label``.

Reference shape: /root/reference/src/Common/GraphSchema/NodeSchema.cs:9-19,
EdgeSchema.cs:11-42, EntityProperty.cs:11-31, IGraphSchemaProvider.cs:15-34.
This is a new implementation for PySpark: physical binding is a mapping from
table name -> DataFrame supplied by a :class:`~.sources.registry.TableRegistry`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from .exceptions import TranspilerBindingError

EDGE_SEP = "@"

# .NET type name (as used in the reference's JSON schema documents,
# tests/SQLRenderer.Test/TestData/MovieGraph.json) -> Spark simple type
_DOTNET_TO_SPARK = {
    "System.String": "string",
    "System.Boolean": "boolean",
    "System.Byte": "tinyint",
    "System.Int16": "smallint",
    "System.Int32": "int",
    "System.Int64": "long",
    "System.Single": "float",
    "System.Double": "double",
    "System.Decimal": "decimal(38,18)",
    "System.DateTime": "timestamp",
    "System.Byte[]": "binary",
}
_SPARK_TO_DOTNET = {v: k for k, v in _DOTNET_TO_SPARK.items()}


def _parse_dotnet_type(name: str) -> tuple[str, bool]:
    """'System.Nullable`1[System.Int32]' -> ('int', True)."""
    nullable = False
    if name.startswith("System.Nullable`1[") and name.endswith("]"):
        nullable = True
        name = name[len("System.Nullable`1[") : -1]
    spark_type = _DOTNET_TO_SPARK.get(name)
    if spark_type is None:
        # permissive: allow Spark simple type strings directly so hand-
        # written schemas need not speak .NET
        spark_type = name
    return spark_type, nullable or spark_type == "string"


def edge_id(source_label: str, verb: str, sink_label: str) -> str:
    """Directional edge identity triple (EdgeSchema.cs:13-16 uses '@')."""
    return f"{source_label}{EDGE_SEP}{verb}{EDGE_SEP}{sink_label}"


@dataclass(frozen=True)
class EntityProperty:
    """A column of a node/edge table exposed as a graph property.

    ``data_type`` is a Spark SQL simple type string ("long", "string",
    "double", "timestamp", "int", "boolean", "array<float>", ...). It is
    advisory: the authoritative type always comes from the backing
    DataFrame's schema at compile time.
    """

    name: str
    data_type: str = "string"
    nullable: bool = True


@dataclass(frozen=True)
class NodeSchema:
    """A node label backed by one table with a single id column."""

    label: str
    table: str
    id_property: str
    properties: tuple[EntityProperty, ...] = ()
    # declared type of the id column (Spark simple type string); the
    # reference JSON dialect carries a real .NET type on IdProperty, so
    # to_json must round-trip it rather than hardcode System.String
    id_property_type: str = "string"
    # tagged-union nodes (`(n:A|B)` label disjunction rewrite): the
    # property column holding the concrete label of each row — drives
    # labels(n). None for ordinary single-label nodes.
    label_property: str | None = None
    # tagged-union nodes (round 9): each member's OWN property names,
    # ((label, (prop, ...)), ...) — properties(n) / map-projection `.*`
    # build per-row member-shaped VARIANT values from this instead of the
    # null-padded merged struct. None for ordinary nodes.
    member_properties: tuple[tuple[str, tuple[str, ...]], ...] | None = None

    @property
    def property_names(self) -> tuple[str, ...]:
        names = [p.name for p in self.properties]
        if self.id_property not in names:
            names.insert(0, self.id_property)
        return tuple(names)


@dataclass(frozen=True)
class EdgeSchema:
    """An edge type (source_label, verb, sink_label) backed by one table.

    ``source_id_property`` / ``sink_id_property`` name the columns of the
    backing table holding the source / sink node ids.
    """

    verb: str
    source_label: str
    sink_label: str
    table: str
    source_id_property: str
    sink_id_property: str
    properties: tuple[EntityProperty, ...] = ()
    source_id_property_type: str = "string"
    sink_id_property_type: str = "string"
    # virtual union edges (`[:A|B]` rewrite): the property column holding
    # the concrete relationship type of each row. None for ordinary edges
    # (type folds to the verb literal). Part of edge identity when set.
    type_property: str | None = None
    # user-facing relationship-type name for VIRTUAL edges (symmetrized /
    # shortest-path rewrites) whose verb is an internal discriminator —
    # type(r) and relationships(p)[i].type display this instead
    display_verb: str | None = None
    # extra identity columns beyond (source, sink): the symmetrized edge
    # of an undirected variable-length rewrite carries the ORIGINAL
    # (src, dst) pair here, so traversing the same relationship in both
    # directions still counts as one edge for Cypher's relationship
    # uniqueness and for DISTINCT/count(DISTINCT r)
    identity_properties: tuple[str, ...] = ()
    # virtual union edges (round 9): each member TYPE's own property
    # names, ((type, (prop, ...)), ...) keyed by the ``type_property``
    # value — properties(r) / map-projection `.*` build per-row
    # member-shaped VARIANTs from this. None for ordinary edges.
    member_properties: tuple[tuple[str, tuple[str, ...]], ...] | None = None

    @property
    def id(self) -> str:
        return edge_id(self.source_label, self.verb, self.sink_label)

    @property
    def property_names(self) -> tuple[str, ...]:
        names = [self.source_id_property, self.sink_id_property]
        names.extend(p.name for p in self.properties if p.name not in names)
        return tuple(names)


class GraphSchema:
    """Registry of node labels and directional edge triples.

    Lookup semantics follow IGraphSchemaProvider.cs:15-34 — edge lookup is
    directional and label-qualified; a miss is a binding error.
    """

    def __init__(self, nodes: list[NodeSchema], edges: list[EdgeSchema]):
        self._nodes: dict[str, NodeSchema] = {}
        self._edges: dict[str, EdgeSchema] = {}
        for n in nodes:
            if n.label in self._nodes:
                raise TranspilerBindingError(f"Duplicate node label '{n.label}'")
            self._nodes[n.label] = n
        for e in edges:
            if e.id in self._edges:
                raise TranspilerBindingError(f"Duplicate edge '{e.id}'")
            self._edges[e.id] = e

    # -- nodes ------------------------------------------------------------
    @property
    def nodes(self) -> list[NodeSchema]:
        return list(self._nodes.values())

    @property
    def edges(self) -> list[EdgeSchema]:
        return list(self._edges.values())

    def has_node(self, label: str) -> bool:
        return label in self._nodes

    def get_node(self, label: str) -> NodeSchema:
        try:
            return self._nodes[label]
        except KeyError:
            raise TranspilerBindingError(
                f"Node label '{label}' is not defined in the graph schema"
            ) from None

    # -- edges ------------------------------------------------------------
    def try_get_edge(
        self, verb: str, source_label: str, sink_label: str
    ) -> EdgeSchema | None:
        return self._edges.get(edge_id(source_label, verb, sink_label))

    def get_edge(self, verb: str, source_label: str, sink_label: str) -> EdgeSchema:
        e = self.try_get_edge(verb, source_label, sink_label)
        if e is None:
            raise TranspilerBindingError(
                f"Edge '{edge_id(source_label, verb, sink_label)}' is not defined "
                "in the graph schema"
            )
        return e

    def edges_by_verb(self, verb: str) -> list[EdgeSchema]:
        return [e for e in self._edges.values() if e.verb == verb]

    def validate(self, tables) -> list[str]:
        """Check every node/edge against its backing table in a
        TableRegistry: table registered, id/source/sink/property columns
        present. Returns a list of problems (empty = valid) so callers can
        report them all at once; raise-on-first via require_valid()."""
        problems: list[str] = []

        def check(kind: str, name: str, table: str, cols: list[str]):
            if table not in tables:
                problems.append(
                    f"{kind} '{name}': backing table '{table}' is not registered"
                )
                return
            have = set(tables.get(table).columns)
            for c in cols:
                if c not in have:
                    problems.append(
                        f"{kind} '{name}': column '{c}' not found in "
                        f"table '{table}' (has: {sorted(have)})"
                    )

        for n in self.nodes:
            check("node", n.label, n.table, list(n.property_names))
        for e in self.edges:
            check("edge", e.id, e.table, list(e.property_names))
        return problems

    def require_valid(self, tables) -> None:
        problems = self.validate(tables)
        if problems:
            raise TranspilerBindingError(
                "Graph schema does not bind to the registered tables:\n  - "
                + "\n  - ".join(problems)
            )

    # -- JSON schema documents --------------------------------------------
    # The user-facing schema format of the reference is a JSON document
    # (tests/SQLRenderer.Test/TestData/MovieGraph.json:1-202, provider in
    # examples/simple/Program.cs:109-143): Nodes with Id/Name/IdProperty/
    # Properties and Edges with Id/Name/FromNode/ToNode/SourceIdProperty/
    # SinkIdProperty/Properties, property types as .NET type names. The
    # JSON carries no physical table names, so the backing table defaults
    # to the lower-cased Name; an optional "Table" key (our extension)
    # overrides it.

    @classmethod
    def from_json(cls, source: str | dict) -> "GraphSchema":
        """Load a schema from a reference-dialect JSON document.

        ``source`` is a path, a JSON string, or an already-parsed dict."""
        if isinstance(source, dict):
            doc = source
        elif source.lstrip().startswith("{"):
            doc = json.loads(source)
        else:
            with open(source, encoding="utf-8") as f:
                doc = json.load(f)

        def props(items) -> tuple[EntityProperty, ...]:
            out = []
            for p in items or []:
                t, nullable = _parse_dotnet_type(p["PropertyType"])
                out.append(EntityProperty(p["PropertyName"], t, nullable))
            return tuple(out)

        def id_type(p: dict) -> str:
            return _parse_dotnet_type(p.get("PropertyType", "System.String"))[0]

        nodes = []
        for n in doc.get("Nodes", []):
            label = n.get("Name") or n["Id"]
            nodes.append(
                NodeSchema(
                    label=label,
                    table=n.get("Table", label.lower()),
                    id_property=n["IdProperty"]["PropertyName"],
                    id_property_type=id_type(n["IdProperty"]),
                    properties=props(n.get("Properties")),
                )
            )
        edges = []
        for e in doc.get("Edges", []):
            verb = e.get("Name") or e["Id"].split(EDGE_SEP)[1]
            edges.append(
                EdgeSchema(
                    verb=verb,
                    source_label=e["FromNode"],
                    sink_label=e["ToNode"],
                    table=e.get("Table", verb.lower()),
                    source_id_property=e["SourceIdProperty"]["PropertyName"],
                    sink_id_property=e["SinkIdProperty"]["PropertyName"],
                    source_id_property_type=id_type(e["SourceIdProperty"]),
                    sink_id_property_type=id_type(e["SinkIdProperty"]),
                    properties=props(e.get("Properties")),
                )
            )
        return cls(nodes, edges)

    def to_json(self) -> str:
        """Serialize back to the reference JSON dialect (round-trips
        through from_json; Spark types map to .NET names where one
        exists, otherwise pass through verbatim)."""

        def prop(p: EntityProperty) -> dict:
            t = _SPARK_TO_DOTNET.get(p.data_type, p.data_type)
            if p.nullable and t != "System.String" and t.startswith("System."):
                t = f"System.Nullable`1[{t}]"
            return {"PropertyName": p.name, "PropertyType": t}

        def id_prop(name: str, spark_type: str) -> dict:
            # id/join-key columns are non-nullable by role, so never wrap
            # in System.Nullable`1
            return {
                "PropertyName": name,
                "PropertyType": _SPARK_TO_DOTNET.get(spark_type, spark_type),
            }

        doc = {
            "Nodes": [
                {
                    "Id": n.label,
                    "Name": n.label,
                    "Table": n.table,
                    "IdProperty": id_prop(n.id_property, n.id_property_type),
                    "Properties": [prop(p) for p in n.properties],
                }
                for n in self.nodes
            ],
            "Edges": [
                {
                    "Id": e.id,
                    "Name": e.verb,
                    "FromNode": e.source_label,
                    "ToNode": e.sink_label,
                    "Table": e.table,
                    "SourceIdProperty": id_prop(
                        e.source_id_property, e.source_id_property_type
                    ),
                    "SinkIdProperty": id_prop(
                        e.sink_id_property, e.sink_id_property_type
                    ),
                    "Properties": [prop(p) for p in e.properties],
                }
                for e in self.edges
            ],
        }
        return json.dumps(doc, indent=2)

    def candidate_edges(
        self,
        verb: str | None,
        source_label: str | None,
        sink_label: str | None,
    ) -> list[EdgeSchema]:
        """All edges compatible with the (possibly partial) constraint."""
        out = []
        for e in self._edges.values():
            if verb is not None and e.verb != verb:
                continue
            if source_label is not None and e.source_label != source_label:
                continue
            if sink_label is not None and e.sink_label != sink_label:
                continue
            out.append(e)
        return out
