from .logical import (
    ColRef,
    DataSourceOp,
    EntityRef,
    JoinOp,
    LogicalOp,
    ProjectOp,
    SelectionOp,
    SetOp,
    TrimOp,
    UnwindOp,
    ValueRef,
)
from .planner import plan_query

__all__ = [
    "ColRef",
    "DataSourceOp",
    "EntityRef",
    "JoinOp",
    "LogicalOp",
    "ProjectOp",
    "SelectionOp",
    "SetOp",
    "TrimOp",
    "UnwindOp",
    "ValueRef",
    "plan_query",
]
