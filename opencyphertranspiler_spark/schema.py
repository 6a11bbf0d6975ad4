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

from dataclasses import dataclass

from .exceptions import TranspilerBindingError

EDGE_SEP = "@"


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
