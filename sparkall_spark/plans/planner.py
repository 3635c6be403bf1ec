"""Logical planning: join graph + needed-predicate (column) pruning.

Re-implements, Spark-first, the two planner concerns of the reference:

- **Join-graph derivation** (reference: Planner.scala:62-88): an edge
  exists from star A to star B when A has a triple ``(pred, ?o)`` and
  ``?o`` is B's subject variable; the join condition is
  ``A.<pred column> = B.<ID column>``.
- **Needed predicates** (reference: Planner.scala:24-60): only columns
  that are projected, filtered, ordered, grouped, aggregated, or used
  as a join key survive the per-star projection.  Catalyst would prune
  anyway, but the explicit select keeps stable aliases and guarantees
  the parquet scan's ReadSchema is minimal.

The reference also scores join orders by source-type weights but never
uses the result (the call is commented out, Run.scala:240); we rely on
Catalyst/AQE/CBO for join ordering and do not port that heuristic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sparkall_spark.plans.model import ParsedQuery


@dataclass(frozen=True)
class JoinEdge:
    left_star: str
    pred: str  # predicate IRI on the left star whose object is the right star's subject
    right_star: str
    obj_var: str  # the shared variable (right star's subject)
    left_outer: bool = False


@dataclass
class QueryPlan:
    query: ParsedQuery
    join_edges: list[JoinEdge]
    needed_preds: dict[str, set[str]]  # star -> predicate IRIs to keep
    project_subject: dict[str, bool] = field(default_factory=dict)  # star var projected raw


def plan_query(q: ParsedQuery) -> QueryPlan:
    edges: list[JoinEdge] = []
    for star in q.stars.values():
        for t in star.triples:
            if t.obj_is_var and t.obj in q.stars and t.obj != star.subject:
                edges.append(
                    JoinEdge(
                        star.subject,
                        t.predicate,
                        t.obj,
                        t.obj,
                        left_outer=t.subject in q.optional_stars
                        or t.obj in q.optional_stars,
                    )
                )

    # variables the query actually consumes; aggregate aliases are output
    # names, not data variables, so ORDER BY on them resolves post-agg
    agg_aliases = {a.alias for a in q.aggregations} | {
        pe.alias for pe in q.post_agg_exprs
    }
    bind_aliases = {b.alias for b in q.binds}
    used_vars: set[str] = set(q.select_vars)
    used_vars.update(f.var for f in q.filters)
    used_vars.update(str(f.value) for f in q.filters if f.value_is_var)
    used_vars.update(k.var for k in q.order_keys if k.var not in agg_aliases)
    used_vars.update(q.group_by)
    used_vars.update(a.var for a in q.aggregations if a.var != "*")
    # BIND inputs are consumed even when only the alias is projected
    from sparkall_spark.plans.exprs import expr_vars

    for b in q.binds:
        used_vars.update(expr_vars(b.expr))
    for ef in q.expr_filters:
        used_vars.update(expr_vars(ef.expr))
    # OPTIONAL-block-scoped filters live on the block records, not in
    # q.filters / q.expr_filters — their columns must stay alive too
    for blk in q.optional_blocks:
        for f in list(blk.var_filters) + list(blk.attach_var_filters):
            used_vars.add(f.var)
            if f.value_is_var:
                used_vars.add(str(f.value))
        for ef in list(blk.expr_filters) + list(blk.attach_expr_filters):
            used_vars.update(expr_vars(ef.expr))
    # subquery join keys: a shared output var must keep its outer
    # column alive even when nothing else projects it
    for sq in q.subqueries:
        used_vars.update(sq.output_vars())
    for vt_vars, _rows in q.values_tables:
        used_vars.update(vt_vars)

    subquery_vars = q.subquery_vars()
    needed: dict[str, set[str]] = {s: set() for s in q.stars}
    for var in used_vars:
        if var in q.stars:
            continue  # subject variable -> ID column, always kept
        if var in bind_aliases:
            continue  # computed post-join, no source column
        if var in subquery_vars and var not in q.var_to_star_pred:
            continue  # surfaced by a { SELECT ... } subquery join
        if var not in q.var_to_star_pred:
            if q.partial_binding and var in q.select_vars:
                continue  # unbound in this UNION branch -> null column
            raise ValueError(f"unknown variable ?{var}")
        star, pred = q.var_to_star_pred[var]
        needed[star].add(pred)
    for e in edges:
        needed[e.left_star].add(e.pred)

    project_subject = {s: (s in q.select_vars) for s in q.stars}
    return QueryPlan(q, edges, needed, project_subject)
