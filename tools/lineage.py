#!/usr/bin/env python
"""Column-level lineage for any registered query.

Walks the ANALYZED logical plan (exprId graph), so it reflects what
the query actually computes, not a parse of the SQL text: every
Alias/window/generator definition contributes `defined exprId ->
referenced exprIds` edges, leaf relation attributes anchor to fixture
tables (matched by column-name fingerprint, since `LogicalRelation`
does not serialize its path), and output columns resolve through the
transitive closure.

Usage:
    python tools/lineage.py q5_region_revenue
    python tools/lineage.py --all        # lineage table for every query

The reference has no lineage story at all (jobs are black-box Flink
DAGs); here it falls out of Catalyst's resolved plan — an engine-level
capability a 100 TB deployment needs for impact analysis ("which
outputs touch `o_totalprice`?") and GDPR column audits.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

#: definition-carrying plan-node fields: each holds a list of
#: expression trees whose root Alias defines a new attribute
DEF_FIELDS = ("projectList", "aggregateExpressions", "windowExpressions")


def _expr_nodes(tree):
    """Flatten one serialized expression tree (list or nested lists of
    node dicts) into node dicts."""
    if isinstance(tree, dict):
        yield tree
    elif isinstance(tree, list):
        for t in tree:
            yield from _expr_nodes(t)


def _attr_ids(nodes):
    return [n["exprId"]["id"] for n in nodes
            if n["class"].endswith("AttributeReference")]


def plan_lineage_edges(plan_json: str):
    """-> (deps: id -> set[id], leaves: id -> (colname, leaf_idx))."""
    nodes = json.loads(plan_json)
    deps: dict[int, set[int]] = {}
    leaves: dict[int, tuple[str, int]] = {}
    leaf_idx = 0
    for node in nodes:
        cls = node["class"]
        if cls.endswith("LogicalRelation") or cls.endswith("LocalRelation"):
            for attr in _expr_nodes(node.get("output", [])):
                if attr["class"].endswith("AttributeReference"):
                    leaves[attr["exprId"]["id"]] = (attr["name"], leaf_idx)
            leaf_idx += 1
            continue
        for field in DEF_FIELDS:
            for tree in node.get(field) or []:
                flat = list(_expr_nodes(tree))
                if not flat:
                    continue
                root = flat[0]
                if root["class"].endswith(".Alias"):
                    did = root["exprId"]["id"]
                    deps.setdefault(did, set()).update(_attr_ids(flat[1:]))
        # generators (explode & co): outputs derive from generator args
        if node.get("generatorOutput"):
            src = set(_attr_ids(_expr_nodes(node.get("generator", []))))
            for attr in _expr_nodes(node["generatorOutput"]):
                if attr["class"].endswith("AttributeReference"):
                    deps.setdefault(attr["exprId"]["id"], set()).update(src)
    return deps, leaves


def _table_fingerprints(spark, sf_dir: str):
    from streamforge_spark.io import TABLES, load
    return {name: frozenset(load(spark, sf_dir, name).columns)
            for name in TABLES}


def column_lineage(spark, df, sf_dir: str = SF) -> dict[str, set[str]]:
    """Map each output column of ``df`` to its source ``table.column``
    set (best effort: leaves whose column set matches no fixture table
    report as ``?.column``)."""
    qe = df._jdf.queryExecution().analyzed()
    deps, leaves = plan_lineage_edges(qe.toJSON())

    # group leaf attrs per relation, fingerprint against fixture tables
    by_leaf: dict[int, list[tuple[int, str]]] = {}
    for eid, (name, li) in leaves.items():
        by_leaf.setdefault(li, []).append((eid, name))
    fps = _table_fingerprints(spark, sf_dir)
    leaf_table = {}
    for li, attrs in by_leaf.items():
        cols = frozenset(n for _, n in attrs)
        table = next((t for t, fp in fps.items() if cols <= fp), "?")
        leaf_table[li] = table

    def resolve(eid, seen):
        if eid in seen:
            return set()
        seen.add(eid)
        if eid in leaves:
            name, li = leaves[eid]
            return {f"{leaf_table[li]}.{name}"}
        out: set[str] = set()
        for d in deps.get(eid, ()):
            out |= resolve(d, seen)
        return out

    result: dict[str, set[str]] = {}
    it = qe.output().iterator()
    while it.hasNext():
        attr = it.next()
        result[attr.name()] = resolve(attr.exprId().id(), set())
    return result


def main() -> None:
    from streamforge_spark import registry
    from streamforge_spark.session import get_spark
    registry.load_all()
    spark = get_spark("lineage")
    spark.sparkContext.setLogLevel("ERROR")
    names = (sorted(registry.QUERIES) if "--all" in sys.argv
             else [a for a in sys.argv[1:] if not a.startswith("-")])
    for name in names:
        try:
            lin = column_lineage(spark, registry.QUERIES[name](spark, SF))
        except Exception as e:  # recursive CTEs etc. degrade gracefully
            print(f"{name}: <unsupported: {type(e).__name__}>")
            continue
        print(name)
        for col, srcs in lin.items():
            print(f"  {col} <- {', '.join(sorted(srcs)) or '(literal)'}")


if __name__ == "__main__":
    main()
